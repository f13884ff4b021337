"""Fused latent-prior-flow kernels (round-3 continuation).

**Measured outcome on this chip: a documented NEGATIVE result, default
off.** The motivation was real — the latent flow is ~1 µs of ideal MXU
work but 1.91 ms when timed IN ISOLATION (tools/prof_train.py) — yet the
in-context A/Bs show XLA already overlaps that tiny-op soup into the big
Pallas kernels' pipeline gaps, while this kernel's custom-call boundary is
a hard serialization point: full train step 11.30 ms fused vs 11.06 XLA;
serving same-run A/Bs a wash (B=1 1.090 fused vs 1.111; B=64 3.26 vs
3.03; B=256 8.65 vs 8.61). Numerics are exact (loss/logp_z bit-match at print precision; parity
and grad-parity tests below). Kept as an option (train.fused_latent_flow /
DPFX_SAMPLE_FUSED_LATENT=1) because the balance is hardware- and
compiler-dependent — and as the measured record that isolated micro-costs
are NOT in-context marginal costs.

Design: one Pallas call keeps the [dz, B] tile and all K layers' weights
VMEM-resident, the same residency trick as dpfx/ops/fused_train.py, with
two structural simplifications the latent shape affords:

  * dz (128 on the flagship) sits on the SUBLANE axis and the batch on the
    128-lane axis — no coordinate padding, no pltpu.roll: the conditioner
    out projection is stored as separate s/t weight stacks.
  * the whole batch fits one grid step (B <= 128 per tile), so the
    backward is a single reverse walk (closed-form inverse reconstructs
    every layer input from the output; the conditioner reads only
    passthrough rows, identical in input and output).

Three entry points:
  * fused_latent_log_prob — log p(z) with a custom-VJP backward
    (training; drop-in for CouplingFlow.log_prob on the prior).
  * fused_latent_inverse — eps -> z for the sampling path.
  * fused_latent_supported — relu + no actnorm + dz % 8 == 0.

Parity/grad tests: tests/test_fused_latent.py (interpret mode vs the flax
path at first compile).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dpfx.models.coupling import make_masks
from dpfx.ops.chamfer import _interpret, _round_up

Array = jax.Array

import os as _os

LAT_VMEM_MB = int(_os.environ.get("DPFX_LAT_VMEM_MB", "64"))
_TB = 128  # batch tile on the lane axis


def fused_latent_supported(flow_cfg, dz: int) -> bool:
    # dz > 16: CouplingFlow switches to channel-first DenseT params at
    # dim <= 16 (a different tree layout this stacker does not read);
    # the flagship dz=128 is the target
    return (flow_cfg.activation == "relu" and not flow_cfg.use_actnorm
            and dz % 8 == 0 and dz > 16)


def stack_latent_params_jnp(params: Dict[str, Any], n_layers: int, dz: int,
                            tree_key: str = "latent_flow") -> Dict[str, Array]:
    """Stack the unconditional flow's conditioner weights with jnp ops (so
    grads flow back through the stacking to the flax tree). The input mask
    is folded into win; the out projection splits into s/t stacks."""
    tree = params["params"][tree_key]
    masks = jnp.asarray(make_masks(dz, n_layers))      # [K, D]; 1 = passthrough
    win, bin_, whs, bhs, ws, bs, wt, bt = [], [], [], [], [], [], [], []
    for ki in range(n_layers):
        cn = tree[f"coupling_{ki}"]["cond_net"]
        kin = cn["in_x"]["kernel"]                     # [D, H]
        win.append(kin.T * masks[ki][None, :])         # [H, D], mask folded
        bin_.append(cn["in_x"]["bias"])
        hidden_names = sorted((n for n in cn if n.startswith("hidden_")),
                              key=lambda s: int(s.split("_")[1]))
        if hidden_names:
            whs.append(jnp.stack([cn[n]["kernel"].T for n in hidden_names]))
            bhs.append(jnp.stack([cn[n]["bias"] for n in hidden_names]))
        ko = cn["out"]["kernel"]                       # [H, 2D]
        bo = cn["out"]["bias"]                         # [2D]
        ws.append(ko[:, :dz].T)                        # [D, H]
        bs.append(bo[:dz])
        wt.append(ko[:, dz:].T)
        bt.append(bo[dz:])
    out = {
        "win": jnp.stack(win),                         # [K, H, D]
        "bin": jnp.stack(bin_)[..., None],             # [K, H, 1]
        "ws": jnp.stack(ws),                           # [K, D, H]
        "bs": jnp.stack(bs)[..., None],                # [K, D, 1]
        "wt": jnp.stack(wt),
        "bt": jnp.stack(bt)[..., None],
    }
    h = out["win"].shape[1]
    if whs:
        out["wh"] = jnp.stack(whs)                     # [K, NH, H, H]
        out["bh"] = jnp.stack(bhs)[..., None]          # [K, NH, H, 1]
    else:
        out["wh"] = jnp.zeros((n_layers, 0, h, h), out["win"].dtype)
        out["bh"] = jnp.zeros((n_layers, 0, h, 1), out["win"].dtype)
    return out


def _masks_d(n_layers: int, dz: int) -> np.ndarray:
    return make_masks(dz, n_layers).astype(np.float32)[..., None]  # [K, D, 1]


def _cond(refs, k, x, dtype, n_hidden_m1):
    """Conditioner hidden chain for layer k from (masked-fold) input x."""
    win_ref, bin_ref, wh_ref, bh_ref = refs
    h = jax.lax.dot_general(
        win_ref[k].astype(dtype), x.astype(dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bin_ref[k]
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


def _st(refs, k, h, dtype):
    ws_ref, bs_ref, wt_ref, bt_ref = refs
    st_s = jax.lax.dot_general(
        ws_ref[k].astype(dtype), h.astype(dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bs_ref[k]
    st_t = jax.lax.dot_general(
        wt_ref[k].astype(dtype), h.astype(dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bt_ref[k]
    return st_s, st_t


# ---------------------------------------------------------------------------
# forward (+log-det) and inverse kernels
# ---------------------------------------------------------------------------


def _lat_fwd_kernel(
    z_ref, win_ref, bin_ref, wh_ref, bh_ref, ws_ref, bs_ref, wt_ref, bt_ref,
    masks_ref, u_ref, ld_ref,
    *, n_layers: int, n_hidden_m1: int, cap: float, dtype,
):
    x = z_ref[...].astype(jnp.float32)                 # [D, TB]
    ld = jnp.zeros((1, x.shape[1]), jnp.float32)
    for k in range(n_layers):
        mask = masks_ref[k]                            # [D, 1]
        inv = 1.0 - mask
        hs = _cond((win_ref, bin_ref, wh_ref, bh_ref), k, x, dtype, n_hidden_m1)
        st_s, st_t = _st((ws_ref, bs_ref, wt_ref, bt_ref), k, hs[-1], dtype)
        s = cap * jnp.tanh(st_s / cap)
        ld = ld + jnp.sum(inv * s, axis=0, keepdims=True)
        x = jnp.where(mask > 0, x, x * jnp.exp(s) + st_t)
    u_ref[...] = x
    ld_ref[...] = jnp.broadcast_to(ld, ld_ref.shape)


def _lat_inv_kernel(
    e_ref, win_ref, bin_ref, wh_ref, bh_ref, ws_ref, bs_ref, wt_ref, bt_ref,
    masks_ref, z_ref,
    *, n_layers: int, n_hidden_m1: int, cap: float, dtype,
):
    y = e_ref[...].astype(jnp.float32)
    for k in reversed(range(n_layers)):
        mask = masks_ref[k]
        hs = _cond((win_ref, bin_ref, wh_ref, bh_ref), k, y, dtype, n_hidden_m1)
        st_s, st_t = _st((ws_ref, bs_ref, wt_ref, bt_ref), k, hs[-1], dtype)
        s = cap * jnp.tanh(st_s / cap)
        y = jnp.where(mask > 0, y, (y - st_t) * jnp.exp(-s))
    z_ref[...] = y


def _lat_bwd_kernel(
    u_ref, du_ref, dld_ref,
    win_ref, bin_ref, wh_ref, bh_ref, ws_ref, bs_ref, wt_ref, bt_ref, masks_ref,
    dz_ref, dwin_ref, dbin_ref, dwh_ref, dbh_ref, dws_ref, dbs_ref,
    dwt_ref, dbt_ref,
    *, n_layers: int, n_hidden_m1: int, cap: float, dtype,
):
    """Single reverse walk; weight grads accumulate into revisited output
    blocks across the (sequential) batch-tile grid."""
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _zero():
        dwin_ref[...] = jnp.zeros_like(dwin_ref)
        dbin_ref[...] = jnp.zeros_like(dbin_ref)
        dwh_ref[...] = jnp.zeros_like(dwh_ref)
        dbh_ref[...] = jnp.zeros_like(dbh_ref)
        dws_ref[...] = jnp.zeros_like(dws_ref)
        dbs_ref[...] = jnp.zeros_like(dbs_ref)
        dwt_ref[...] = jnp.zeros_like(dwt_ref)
        dbt_ref[...] = jnp.zeros_like(dbt_ref)

    g8 = dld_ref[...]                                  # [8, TB]; rows equal
    g_ld = jnp.max(g8, axis=0, keepdims=True)          # [1, TB]

    dy = du_ref[...].astype(jnp.float32)
    y = u_ref[...].astype(jnp.float32)
    for k in reversed(range(n_layers)):
        mask = masks_ref[k]
        inv = 1.0 - mask
        # conditioner forward from the layer OUTPUT (passthrough rows are
        # identical to the input's; mask folded into win)
        hs = _cond((win_ref, bin_ref, wh_ref, bh_ref), k, y, dtype, n_hidden_m1)
        st_s, st_t = _st((ws_ref, bs_ref, wt_ref, bt_ref), k, hs[-1], dtype)
        th = jnp.tanh(st_s / cap)
        s = cap * th
        es = jnp.exp(s)
        x_k = jnp.where(mask > 0, y, (y - st_t) / es)  # closed-form inverse
        ds = dy * x_k * es * inv + g_ld * inv
        ds_s = ds * (1.0 - th * th)
        d_t = dy * inv
        dh = jax.lax.dot_general(
            ws_ref[k].astype(dtype), ds_s.astype(dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            wt_ref[k].astype(dtype), d_t.astype(dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # [H, TB]
        dws_ref[k] += jax.lax.dot_general(
            ds_s.astype(dtype), hs[-1].astype(dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbs_ref[k] += jnp.sum(ds_s, axis=1, keepdims=True)
        dwt_ref[k] += jax.lax.dot_general(
            d_t.astype(dtype), hs[-1].astype(dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbt_ref[k] += jnp.sum(d_t, axis=1, keepdims=True)
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
        dwin_ref[k] += jax.lax.dot_general(
            dh.astype(dtype), x_k.astype(dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbin_ref[k] += jnp.sum(dh, axis=1, keepdims=True)
        dy = jnp.where(mask > 0, dy, dy * es) + jax.lax.dot_general(
            win_ref[k].astype(dtype), dh.astype(dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = x_k
    dz_ref[...] = dy


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------


def _w_specs(k, h, d, nh1):
    full = lambda i: (0, 0, 0)
    return [
        pl.BlockSpec((k, h, d), full, memory_space=pltpu.VMEM),        # win
        pl.BlockSpec((k, h, 1), full, memory_space=pltpu.VMEM),        # bin
        pl.BlockSpec((k, nh1, h, h), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, nh1, h, 1), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, d, h), full, memory_space=pltpu.VMEM),        # ws
        pl.BlockSpec((k, d, 1), full, memory_space=pltpu.VMEM),        # bs
        pl.BlockSpec((k, d, h), full, memory_space=pltpu.VMEM),        # wt
        pl.BlockSpec((k, d, 1), full, memory_space=pltpu.VMEM),        # bt
        pl.BlockSpec((k, d, 1), full, memory_space=pltpu.VMEM),        # masks
    ]


def _w_args(w, k, h, d, dz):
    nh1_w = _nonempty(w["wh"], (k, 1, h, h))
    nh1_b = _nonempty(w["bh"], (k, 1, h, 1))
    return (w["win"], w["bin"], nh1_w, nh1_b, w["ws"], w["bs"], w["wt"],
            w["bt"], jnp.asarray(_masks_d(k, dz)))


def _nonempty(a: Array, shape) -> Array:
    if a.shape[1] == 0:
        return jnp.zeros(shape, a.dtype)
    return a


def _compiler_params():
    if LAT_VMEM_MB and not _interpret():
        return {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=LAT_VMEM_MB * 1024 * 1024)}
    return {}


def _pad_cols(zt: Array) -> Array:
    d, b = zt.shape
    b_pad = _round_up(b, _TB)
    if b_pad != b:
        zt = jnp.pad(zt, ((0, 0), (0, b_pad - b)))
    return zt


def _fwd_call(static, w, zt):
    (k, h, nh, d, dz, cap, dtype_name) = static
    dtype = jnp.dtype(dtype_name)
    b_pad = zt.shape[1]
    nb = b_pad // _TB
    nh1 = max(nh, 1)
    kernel = functools.partial(
        _lat_fwd_kernel, n_layers=k, n_hidden_m1=nh, cap=cap, dtype=dtype)
    u, ld = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((d, _TB), lambda i: (0, i), memory_space=pltpu.VMEM)]
        + _w_specs(k, h, d, nh1),
        out_specs=[
            pl.BlockSpec((d, _TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _TB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, b_pad), jnp.float32),
        ],
        interpret=_interpret(),
        **_compiler_params(),
    )(zt, *_w_args(w, k, h, d, dz))
    return u, ld[0]                                    # [D, Bp], [Bp]


def _bwd_call(static, w, u, du, dld):
    (k, h, nh, d, dz, cap, dtype_name) = static
    dtype = jnp.dtype(dtype_name)
    b_pad = u.shape[1]
    nb = b_pad // _TB
    nh1 = max(nh, 1)
    kernel = functools.partial(
        _lat_bwd_kernel, n_layers=k, n_hidden_m1=nh, cap=cap, dtype=dtype)
    dld8 = jnp.broadcast_to(dld[None, :], (8, b_pad)).astype(jnp.float32)
    full = lambda i: (0, 0, 0)
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((d, _TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, _TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _TB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + _w_specs(k, h, d, nh1),
        out_specs=[
            pl.BlockSpec((d, _TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, h, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, h, 1), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, nh1, h, h), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, nh1, h, 1), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d, h), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d, 1), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d, h), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d, 1), full, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((k, h, d), jnp.float32),
            jax.ShapeDtypeStruct((k, h, 1), jnp.float32),
            jax.ShapeDtypeStruct((k, nh1, h, h), jnp.float32),
            jax.ShapeDtypeStruct((k, nh1, h, 1), jnp.float32),
            jax.ShapeDtypeStruct((k, d, h), jnp.float32),
            jax.ShapeDtypeStruct((k, d, 1), jnp.float32),
            jax.ShapeDtypeStruct((k, d, h), jnp.float32),
            jax.ShapeDtypeStruct((k, d, 1), jnp.float32),
        ],
        interpret=_interpret(),
        **_compiler_params(),
    )(u, du, dld8, *_w_args(w, k, h, d, dz))
    dzt, dwin, dbin, dwh, dbh, dws, dbs, dwt, dbt = outs
    if nh == 0:
        dwh = dwh[:, :0]
        dbh = dbh[:, :0]
    dw = {"win": dwin, "bin": dbin, "wh": dwh, "bh": dbh,
          "ws": dws, "bs": dbs, "wt": dwt, "bt": dbt}
    return dw, dzt


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lat_forward(static, w, zt):
    return _fwd_call(static, w, zt)


def _lat_forward_fwd(static, w, zt):
    u, ld = _fwd_call(static, w, zt)
    return (u, ld), (w, u)  # residual = output; backward walks the inverse


def _lat_forward_bwd(static, res, cots):
    w, u = res
    du, dld = cots
    dw, dzt = _bwd_call(static, w, u, du, dld)
    return dw, dzt


_lat_forward.defvjp(_lat_forward_fwd, _lat_forward_bwd)


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------


def _static(flow_cfg, dz: int, h: int, nh: int):
    return (flow_cfg.n_layers, h, nh, dz, dz, float(flow_cfg.scale_cap),
            jnp.dtype(flow_cfg.compute_dtype).name)


def fused_latent_log_prob(params: Dict[str, Any], z: Array, flow_cfg,
                          tree_key: str = "latent_flow") -> Array:
    """log p(z) under the latent prior flow: z [B, dz] -> [B]. Identical
    math to CouplingFlow.log_prob; grads via the fused backward kernel."""
    b, dz = z.shape
    w = stack_latent_params_jnp(params, flow_cfg.n_layers, dz, tree_key)
    h = w["win"].shape[1]
    nh = flow_cfg.n_hidden - 1
    zt = _pad_cols(jnp.swapaxes(z, 0, 1).astype(jnp.float32))
    u, ld = _lat_forward(_static(flow_cfg, dz, h, nh), w, zt)
    u_b = u[:, :b]
    log_base = -0.5 * jnp.sum(u_b * u_b + jnp.log(2.0 * jnp.pi), axis=0)
    return log_base + ld[:b]


def fused_latent_inverse(params: Dict[str, Any], eps: Array, flow_cfg,
                         tree_key: str = "latent_flow",
                         stacked: Dict[str, Array] | None = None) -> Array:
    """eps [B, dz] -> z (sampling path; closed-form layer inverses).

    ``stacked`` optionally supplies PRE-stacked weights (computed once,
    concretely, outside the jitted sampler) — the traced stacking costs
    real per-call time on the serving path."""
    b, dz = eps.shape
    w = stacked if stacked is not None else stack_latent_params_jnp(
        params, flow_cfg.n_layers, dz, tree_key)
    h = w["win"].shape[1]
    nh = flow_cfg.n_hidden - 1
    (k, h_, nh_, d, _, cap, dtype_name) = _static(flow_cfg, dz, h, nh)
    dtype = jnp.dtype(dtype_name)
    et = _pad_cols(jnp.swapaxes(eps, 0, 1).astype(jnp.float32))
    b_pad = et.shape[1]
    nb = b_pad // _TB
    nh1 = max(nh, 1)
    kernel = functools.partial(
        _lat_inv_kernel, n_layers=k, n_hidden_m1=nh, cap=cap, dtype=dtype)
    z = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((d, _TB), lambda i: (0, i), memory_space=pltpu.VMEM)]
        + _w_specs(k, h, d, nh1),
        out_specs=pl.BlockSpec((d, _TB), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, b_pad), jnp.float32),
        interpret=_interpret(),
        **_compiler_params(),
    )(et, *_w_args(w, k, h, d, dz))
    return jnp.swapaxes(z[:, :b], 0, 1)
