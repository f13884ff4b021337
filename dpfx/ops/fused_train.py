"""Fused forward(+log-det) custom-VJP point-flow kernels for TRAINING
(SURVEY.md §8 step 7; round-2 VERDICT item 1: "break the train-step
streaming roofline").

Why: on the flagship config the point flow is 73-77% of the train step and
XLA executes it as a sea of ~0.05 ms bandwidth-bound per-layer fusions —
every coupling layer streams [B, H, N] activations through HBM in the
forward AND the backward pass (~20% train MFU, ROUND2_NOTES). These kernels
apply the same VMEM-residency trick that took sampling 13 GB -> 12 MB of
HBM traffic:

  * forward kernel: one (cloud, point-tile) grid step runs all K coupling
    layers with the x-tile and every layer's weights resident in VMEM,
    emitting u and the per-cloud log-det. Nothing else touches HBM.
  * backward kernel: recomputes the forward chain in VMEM (storing only the
    [K+1, 8, T] layer-input chain and the [K, 8, T] pre-cap conditioner
    outputs — ~1 MB at T=512), then walks the layers in reverse computing
    input/weight/conditioner gradients. Weight grads accumulate in
    revisited VMEM output blocks across the sequential TPU grid.

The pair is wired as a jax.custom_vjp around the stacked-weights function,
so `jax.grad` through the ELBO composes transparently with the encoder /
latent-flow XLA graph. The z-projection hz = einsum(z, Wz) + bx stays in
XLA on both sides of the boundary (tiny, and its VJP gives dWz/dbx/dz for
free).

Semantics parity: identical math to CouplingFlow.forward / log_prob
(masked affine coupling, tanh scale cap, relu conditioner); parity +
grad-parity tests in tests/test_fused_train.py. Restrictions: relu
activation, no actnorm (guarded by `fused_train_supported`).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dpfx.models.coupling import make_masks
from dpfx.ops.chamfer import _interpret, _round_up

Array = jax.Array

# Tile sizes (points on the 128-lane axis). The backward kernel holds the
# layer-input + st chains and all weight-grad accumulators in VMEM, so it
# runs a smaller tile than the forward. Both are A/B-tunable on-chip.
# BWD_VMEM_MB optionally raises Mosaic's 16 MB scoped-vmem limit for the
# backward kernel (the 32 unrolled layers' intermediates are not perfectly
# stack-reused; measured OOM at tile=512 with the default limit).
import os as _os

FWD_TILE = int(_os.environ.get("DPFX_FWD_TILE", "2048"))
FWD_ROLLED = bool(int(_os.environ.get("DPFX_FWD_ROLLED", "0")))
BWD_TILE = int(_os.environ.get("DPFX_BWD_TILE", "2048"))
BWD_VMEM_MB = int(_os.environ.get("DPFX_BWD_VMEM_MB", "32"))
# rolled layer loop (lax.fori_loop) vs python-unrolled: rolled reuses the
# Mosaic stack slots across layers (smaller scoped VMEM -> larger tiles
# become viable) at the cost of dynamic layer indexing into the weight refs.
# Round-3 same-run full-step A/B (B=64 N=2048 flagship): tile=2048+rolled
# 11.85 ms/step vs 12.30 for tile=1024 unrolled -> adopted defaults.
BWD_ROLLED = bool(int(_os.environ.get("DPFX_BWD_ROLLED", "1")))


def fused_train_supported(flow_cfg) -> bool:
    """The kernel pair covers the flagship configuration: relu conditioner
    (backward needs the activation derivative) and no actnorm."""
    return flow_cfg.activation == "relu" and not flow_cfg.use_actnorm


def stack_point_flow_params_jnp(params: Dict[str, Any], n_layers: int) -> Dict[str, Array]:
    """TRACED analogue of fused_sampler.stack_point_flow_params: builds the
    stacked weight arrays with jnp ops so gradients flow back through the
    stacking (transpose / pad / mask-fold are all linear) to the original
    flax tree."""
    tree = params["params"]["point_flow"]
    ks = [f"coupling_{k}" for k in range(n_layers)]
    masks3 = make_masks(3, n_layers)  # [K, 3] np; 1 = passthrough
    wx, bx, wz, whs, bhs, wout, bout = [], [], [], [], [], [], []
    for ki, k in enumerate(ks):
        cn = tree[k]["cond_net"]
        kin = cn["in_x"]["kernel"]                   # [3, H]
        h = kin.shape[1]
        # fold the layer's input mask into Wx (Wx @ (x*m) == (Wx*m) @ x)
        wx_k = jnp.zeros((h, 8), kin.dtype).at[:, :3].set(
            kin.T * jnp.asarray(masks3[ki])[None, :]
        )
        wx.append(wx_k)
        bx.append(cn["in_x"]["bias"])
        wz.append(cn["in_z"]["kernel"])              # [dz, H]
        hidden_names = sorted((n for n in cn if n.startswith("hidden_")),
                              key=lambda s: int(s.split("_")[1]))
        if hidden_names:
            whs.append(jnp.stack([cn[n]["kernel"].T for n in hidden_names]))
            bhs.append(jnp.stack([cn[n]["bias"] for n in hidden_names]))
        ko = cn["out"]["kernel"]                     # [H, 6]
        wout.append(jnp.zeros((8, h), ko.dtype).at[:6, :].set(ko.T))
        bout.append(jnp.zeros((8,), ko.dtype).at[:6].set(cn["out"]["bias"]))
    out = {
        "wx": jnp.stack(wx),                         # [K, H, 8]
        "wz": jnp.stack(wz),                         # [K, dz, H]
        "bx": jnp.stack(bx),                         # [K, H]
        "wout": jnp.stack(wout),                     # [K, 8, H]
        "bout": jnp.stack(bout)[..., None],          # [K, 8, 1]
    }
    if whs:
        out["wh"] = jnp.stack(whs)                   # [K, NH, H, H]
        out["bh"] = jnp.stack(bhs)[..., None]        # [K, NH, H, 1]
    else:
        h = out["wx"].shape[1]
        out["wh"] = jnp.zeros((n_layers, 0, h, h), out["wx"].dtype)
        out["bh"] = jnp.zeros((n_layers, 0, h, 1), out["wx"].dtype)
    return out


def _masks8(n_layers: int) -> np.ndarray:
    masks = np.ones((n_layers, 8), np.float32)
    masks[:, :3] = make_masks(3, n_layers)
    return masks[..., None]  # [K, 8, 1]


# ---------------------------------------------------------------------------
# forward kernel: u + per-cloud log-det
# ---------------------------------------------------------------------------


def _fwd_kernel(
    hz_ref, x_ref, wx_ref, wh_ref, bh_ref, wout_ref, bout_ref, masks_ref,
    u_ref, ld_ref,
    *, n_layers: int, n_hidden_m1: int, t: int, cap: float, dtype,
    n_points: int, rolled: bool = False,
):
    def layer(k, carry):
        x, ld_row = carry
        mask = masks_ref[k]                          # [8, 1]; padded rows 1
        inv = 1.0 - mask
        h = jax.lax.dot_general(
            wx_ref[k].astype(dtype), x.astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + hz_ref[0, k]                             # [H, T]
        h = jnp.maximum(h, 0.0).astype(dtype)        # relu
        for j in range(n_hidden_m1):
            h = jax.lax.dot_general(
                wh_ref[k, j].astype(dtype), h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bh_ref[k, j]
            h = jnp.maximum(h, 0.0).astype(dtype)
        st = jax.lax.dot_general(
            wout_ref[k].astype(dtype), h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bout_ref[k]                              # [8, T] f32
        s = cap * jnp.tanh(st / cap)
        tt = pltpu.roll(st, shift=5, axis=0)         # t rows 3-5 -> rows 0-2
        ld_row = ld_row + jnp.sum(inv * s, axis=0, keepdims=True)
        x = jnp.where(mask > 0, x, x * jnp.exp(s) + tt)
        return x, ld_row

    x = x_ref[0].astype(jnp.float32)                 # [8, T]; rows 3-7 zero
    ld_row = jnp.zeros((1, t), jnp.float32)
    if rolled:
        x, ld_row = jax.lax.fori_loop(0, n_layers, layer, (x, ld_row))
    else:
        for k in range(n_layers):                    # unrolled: static layer addressing
            x, ld_row = layer(k, (x, ld_row))

    u_ref[0] = x
    i = pl.program_id(1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1) + i * t
    valid = (col < n_points).astype(jnp.float32)
    ld_val = jnp.sum(ld_row * valid)
    ld_ref[0, 0] = jnp.full((128,), ld_val, jnp.float32)


def _fwd_call(static, w, xt, hz):
    (k, h, nh, cap, dtype_name, n_points, tile) = static
    dtype = jnp.dtype(dtype_name)
    b, _, n_pad = xt.shape
    nt = n_pad // tile
    masks = jnp.asarray(_masks8(k))
    kernel = functools.partial(
        _fwd_kernel, n_layers=k, n_hidden_m1=nh, t=tile, cap=cap, dtype=dtype,
        n_points=n_points, rolled=FWD_ROLLED,
    )
    full_w = lambda b_, i: (0, 0, 0)
    u, ld = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, k, h, 1), lambda b_, i: (b_, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile), lambda b_, i: (b_, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, h, 8), full_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, max(nh, 1), h, h), lambda b_, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, max(nh, 1), h, 1), lambda b_, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 8, h), full_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 8, 1), full_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 8, 1), full_w, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, tile), lambda b_, i: (b_, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda b_, i: (b_, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, nt, 128), jnp.float32),
        ],
        interpret=_interpret(),
    )(
        hz, xt, w["wx"], _nonempty(w["wh"], (k, 1, h, h)),
        _nonempty(w["bh"], (k, 1, h, 1)), w["wout"], w["bout"], masks,
    )
    return u, jnp.sum(ld[:, :, 0], axis=1)           # [B, 8, Np], [B]


def _nonempty(a: Array, shape) -> Array:
    if a.shape[1] == 0 if a.ndim == 4 else a.size == 0:
        return jnp.zeros(shape, a.dtype)
    return a


# ---------------------------------------------------------------------------
# backward kernel: dx, dhz, and all weight grads in one pass
# ---------------------------------------------------------------------------


def _bwd_kernel(
    hz_ref, u_ref, du_ref, dld_ref,
    wx_ref, wh_ref, bh_ref, wout_ref, bout_ref, masks_ref,
    dx_ref, dhz_ref, dwx_ref, dwh_ref, dbh_ref, dwout_ref, dbout_ref,
    *, n_layers: int, n_hidden_m1: int, t: int, cap: float, dtype,
    n_points: int, rolled: bool = False,
):
    """One (cloud, point-tile) grid step of the fused backward — a single
    reverse walk with NO stored forward chain.

    The coupling's closed-form inverse makes the forward residuals
    reconstructible on the fly: layer k's conditioner reads only the
    passthrough rows, which are IDENTICAL in its input and output (the mask
    is folded into wx), so `hidden_chain(k, y_k)` reproduces the forward
    hidden activations bit-exactly from the layer OUTPUT, and the layer
    input follows from the inverse transform. Per layer: one conditioner
    forward (shared by st and the weight-grad contractions), the cotangent
    backprop, and the weight-grad matmuls — ~9 matmuls vs the 11 of a
    store-and-recompute scheme, and zero VMEM scratch. Weight grads
    accumulate into revisited output blocks; the TPU grid is sequential, so
    `zero on first step, += always` is exact."""
    b_, i = pl.program_id(0), pl.program_id(1)
    first = jnp.logical_and(b_ == 0, i == 0)

    @pl.when(first)
    def _zero_weight_grads():
        dwx_ref[...] = jnp.zeros_like(dwx_ref)
        dwh_ref[...] = jnp.zeros_like(dwh_ref)
        dbh_ref[...] = jnp.zeros_like(dbh_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dbout_ref[...] = jnp.zeros_like(dbout_ref)

    @pl.when(i == 0)
    def _zero_dhz():
        dhz_ref[...] = jnp.zeros_like(dhz_ref)

    def hidden_chain(k, x):
        """Conditioner hidden activations h1..h_last for layer k."""
        h = jax.lax.dot_general(
            wx_ref[k].astype(dtype), x.astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + hz_ref[0, k]
        h = jnp.maximum(h, 0.0)
        hs = [h]
        for j in range(n_hidden_m1):
            h = jax.lax.dot_general(
                wh_ref[k, j].astype(dtype), h.astype(dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bh_ref[k, j]
            h = jnp.maximum(h, 0.0)
            hs.append(h)
        return hs

    col = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1) + i * t
    valid = (col < n_points).astype(jnp.float32)
    g_ld = dld_ref[0, 0, 0]

    def layer_step(k, dy, y):
        mask = masks_ref[k]
        inv = 1.0 - mask
        # conditioner forward from the layer OUTPUT (masked rows identical
        # to the input's): hs and st equal the forward pass bit-exactly
        hs = hidden_chain(k, y)
        st = jax.lax.dot_general(
            wout_ref[k].astype(dtype), hs[-1].astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bout_ref[k]
        th = jnp.tanh(st / cap)
        s = cap * th
        es = jnp.exp(s)
        tt = pltpu.roll(st, shift=5, axis=0)
        # closed-form inverse: reconstruct the layer input
        x_k = jnp.where(mask > 0, y, (y - tt) / es)
        # coupling-transform cotangents (y = m*x + (1-m)*(x*es + t_roll))
        ds = dy * x_k * es * inv + (g_ld * inv) * valid
        d_st = ds * (1.0 - th * th) + pltpu.roll(dy * inv, shift=3, axis=0)
        dh = jax.lax.dot_general(
            wout_ref[k].astype(dtype), d_st.astype(dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # wout^T @ d_st: [H, T]
        dwout_ref[k] += jax.lax.dot_general(
            d_st.astype(dtype), hs[-1].astype(dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # [8, H]
        dbout_ref[k] += jnp.sum(d_st, axis=1, keepdims=True)
        for j in reversed(range(n_hidden_m1)):
            dh = dh * (hs[j + 1] > 0)
            dwh_ref[k, j] += jax.lax.dot_general(
                dh.astype(dtype), hs[j].astype(dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dbh_ref[k, j] += jnp.sum(dh, axis=1, keepdims=True)
            dh = jax.lax.dot_general(
                wh_ref[k, j].astype(dtype), dh.astype(dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dh = dh * (hs[0] > 0)
        dwx_ref[k] += jax.lax.dot_general(
            dh.astype(dtype), x_k.astype(dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # [H, 8]
        dhz_ref[0, k] += jnp.sum(dh, axis=1, keepdims=True)
        dy = jnp.where(mask > 0, dy, dy * es) + jax.lax.dot_general(
            wx_ref[k].astype(dtype), dh.astype(dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # wx^T @ dh: [8, T]
        return dy, x_k

    dy = du_ref[0].astype(jnp.float32)
    y = u_ref[0].astype(jnp.float32)                 # x_K = forward output
    if rolled:
        dy, _ = jax.lax.fori_loop(
            0, n_layers,
            lambda j, c: layer_step(n_layers - 1 - j, *c), (dy, y))
    else:
        for k in reversed(range(n_layers)):
            dy, y = layer_step(k, dy, y)

    dx_ref[0] = dy


def _bwd_call(static, w, u, hz, du, dld):
    (k, h, nh, cap, dtype_name, n_points, _) = static
    tile = min(BWD_TILE, u.shape[2])
    dtype = jnp.dtype(dtype_name)
    b, _, n_pad = u.shape
    if n_pad % tile:
        tile = int(np.gcd(n_pad, tile))
    nt = n_pad // tile
    masks = jnp.asarray(_masks8(k))
    nh1 = max(nh, 1)
    kernel = functools.partial(
        _bwd_kernel, n_layers=k, n_hidden_m1=nh, t=tile, cap=cap, dtype=dtype,
        n_points=n_points, rolled=BWD_ROLLED,
    )
    full_w = lambda b_, i: (0, 0, 0)
    dld3 = jnp.broadcast_to(dld[:, None, None], (b, 1, 128)).astype(jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, k, h, 1), lambda b_, i: (b_, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile), lambda b_, i: (b_, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile), lambda b_, i: (b_, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda b_, i: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, h, 8), full_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, nh1, h, h), lambda b_, i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, nh1, h, 1), lambda b_, i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 8, h), full_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 8, 1), full_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 8, 1), full_w, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, tile), lambda b_, i: (b_, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, h, 1), lambda b_, i: (b_, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, h, 8), full_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, nh1, h, h), lambda b_, i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, nh1, h, 1), lambda b_, i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 8, h), full_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 8, 1), full_w, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, k, h, 1), jnp.float32),
            jax.ShapeDtypeStruct((k, h, 8), jnp.float32),
            jax.ShapeDtypeStruct((k, nh1, h, h), jnp.float32),
            jax.ShapeDtypeStruct((k, nh1, h, 1), jnp.float32),
            jax.ShapeDtypeStruct((k, 8, h), jnp.float32),
            jax.ShapeDtypeStruct((k, 8, 1), jnp.float32),
        ],
        interpret=_interpret(),
        **({"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=BWD_VMEM_MB * 1024 * 1024)}
           if BWD_VMEM_MB and not _interpret() else {}),
    )(
        hz, u, du, dld3, w["wx"], _nonempty(w["wh"], (k, 1, h, h)),
        _nonempty(w["bh"], (k, 1, h, 1)), w["wout"], w["bout"], masks,
    )
    dx, dhz, dwx, dwh, dbh, dwout, dbout = outs
    if nh == 0:
        dwh = dwh[:, :0]
        dbh = dbh[:, :0]
    dw = {"wx": dwx, "wh": dwh, "bh": dbh, "wout": dwout, "bout": dbout}
    return dw, dx, dhz


# ---------------------------------------------------------------------------
# custom_vjp plumbing
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_forward(static, w, xt, hz):
    """(stacked weights, xt [B,8,Np], hz [B,K,H,1]) -> (u [B,8,Np], ld [B]).

    w carries only the in-kernel weights (wx/wh/bh/wout/bout); the
    z-projection weights live outside in XLA."""
    return _fwd_call(static, w, xt, hz)


def _fused_forward_fwd(static, w, xt, hz):
    u, ld = _fwd_call(static, w, xt, hz)
    # residual = u, NOT xt: the backward reconstructs every layer input
    # from the output via the closed-form inverse (no stored chain)
    return (u, ld), (w, u, hz)


def _fused_forward_bwd(static, res, cots):
    w, u, hz = res
    du, dld = cots
    dw, dx, dhz = _bwd_call(static, w, u, hz, du, dld)
    return dw, dx, dhz


_fused_forward.defvjp(_fused_forward_fwd, _fused_forward_bwd)


def fused_point_flow_recon_ll(
    params: Dict[str, Any],
    x: Array,
    z: Array,
    flow_cfg,
    tile: int = FWD_TILE,
) -> Array:
    """Per-cloud reconstruction log-likelihood sum_i log p(x_i | z) through
    the fused kernel pair. x: [B, N, 3], z: [B, dz] -> [B].

    Drop-in for `point_flow.log_prob(x, z).sum(-1)` inside the ELBO
    (identical math; grads via the fused backward kernel)."""
    b, n, _ = x.shape
    k = flow_cfg.n_layers
    nh = flow_cfg.n_hidden - 1
    w_all = stack_point_flow_params_jnp(params, k)
    h = w_all["wx"].shape[1]
    tile = max(128, min(tile, _round_up(n, 128)))
    n_pad = _round_up(n, tile)

    hz = jnp.einsum("bd,kdh->bkh", z.astype(w_all["wz"].dtype), w_all["wz"])
    hz = (hz + w_all["bx"]).astype(jnp.float32)[..., None]    # [B, K, H, 1]

    xt = jnp.zeros((b, 8, n_pad), jnp.float32)
    xt = xt.at[:, :3, :n].set(jnp.swapaxes(x, 1, 2).astype(jnp.float32))

    static = (k, h, nh, float(flow_cfg.scale_cap),
              jnp.dtype(flow_cfg.compute_dtype).name, n, tile)
    w = {key: w_all[key] for key in ("wx", "wh", "bh", "wout", "bout")}
    u, ld = _fused_forward(static, w, xt, hz)
    u3 = u[:, :3, :n]
    log_base = -0.5 * jnp.sum(
        u3 * u3 + jnp.log(2.0 * jnp.pi), axis=(1, 2)
    )
    return log_base + ld
