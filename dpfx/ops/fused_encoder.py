"""Fused PointNet-encoder kernels: per-point MLP + max-pool in VMEM.

Why (round-3 trace): the encoder costs ~1.5 ms of the 12 ms flagship train
step in XLA, and it is HBM-bound, not FLOP-bound — the [B, N, 512] bf16
activation tensors (134 MB at B=64 N=2048) are written in the forward and
re-read as residuals in the backward. The same VMEM-residency +
backward-recompute trick as dpfx.ops.fused_train removes that traffic:

  * forward kernel: one grid step per cloud runs the whole per-point MLP
    (3->128->128->256->512 in the flagship) on a VMEM-resident transposed
    tile and emits only the max-pooled feature row [W_last].
  * backward kernel: recomputes the activation chain in VMEM (bit-exact —
    same ops, same order), rebuilds the max mask from the saved pooled
    output, and accumulates weight/bias grads in revisited VMEM blocks
    across the sequential grid. dx is one extra small matmul.

Max-pool tie semantics match jax.numpy.max's VJP exactly: the cotangent is
split evenly among all maximal points (mask / count — verified against
jax.grad on ties).

The op reads the SAME flax param tree as PointNetEncoder (no renaming —
checkpoints and the torch converter are unaffected); the tiny FC heads
stay in XLA/jnp where fusion is already optimal. Parity + grad-parity
tests: tests/test_fused_encoder.py. Restrictions (guarded by
`fused_encoder_supported`): relu activation, whole cloud resident in one
grid step (N padded to a lane multiple, <= MAX_POINTS).

Reference parity note: the reference's encoder is C5 in SURVEY.md §2 —
shared per-point MLP + max-pool (arXiv:2007.10170); this is a faithful
TPU-native execution strategy for the same math.
"""

from __future__ import annotations

import functools
import os as _os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dpfx.ops.chamfer import _interpret, _round_up

Array = jax.Array

# whole-cloud residency bound: [512, 8192] bf16 transient = 8 MB; beyond
# that fall back to the flax path (training clouds are N=2048)
MAX_POINTS = int(_os.environ.get("DPFX_ENC_MAX_POINTS", "8192"))
ENC_VMEM_MB = int(_os.environ.get("DPFX_ENC_VMEM_MB", "48"))


def fused_encoder_supported(enc_cfg, n_points: int) -> bool:
    return enc_cfg.activation == "relu" and n_points <= MAX_POINTS


def encoder_point_weights(params: Dict[str, Any], n_point: int):
    """Transposed [out, in] point-MLP weights + [out, 1] biases from the
    flax tree (first kernel padded [W0, 8] for the transposed x layout)."""
    tree = params["params"]["encoder"]
    ws, bs = [], []
    for i in range(n_point):
        kin = tree[f"point_{i}"]["kernel"]            # [in, out]
        b = tree[f"point_{i}"]["bias"]                # [out]
        w = kin.T                                     # [out, in]
        if i == 0:
            w = jnp.zeros((w.shape[0], 8), w.dtype).at[:, :3].set(w)
        ws.append(w)
        bs.append(b[:, None])
    return ws, bs


def _fwd_kernel(x_ref, *refs, n_layers: int, t: int, n_points: int, dtype):
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    g_ref = refs[2 * n_layers]
    h = x_ref[0]                                      # [8, T] f32
    for i in range(n_layers):
        h = jax.lax.dot_general(
            w_refs[i][...].astype(dtype), h.astype(dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(dtype) + b_refs[i][...].astype(dtype)
        h = jnp.maximum(h, jnp.zeros((), dtype))      # [W_i, T] in dtype
    col = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    neg = jnp.asarray(-jnp.inf, h.dtype)
    h = jnp.where(col < n_points, h, neg)             # mask padded columns
    # [W_last, 1] sublane-major pooled row (avoids 1D stores / transposes)
    g_ref[0] = jnp.max(h, axis=1, keepdims=True).astype(jnp.float32)


def _row_spec(w_last: int):
    return pl.BlockSpec((1, w_last, 1), lambda b_: (b_, 0, 0),
                        memory_space=pltpu.VMEM)


def _bwd_kernel(x_ref, g_ref, dg_ref, *refs, n_layers: int, t: int,
                n_points: int, dtype):
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    dx_ref = refs[2 * n_layers]
    dw_refs = refs[2 * n_layers + 1:3 * n_layers + 1]
    db_refs = refs[3 * n_layers + 1:]

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        for r in dw_refs + db_refs:
            r[...] = jnp.zeros_like(r)

    # bit-exact recompute of the forward chain (same ops, same order)
    hs = [x_ref[0]]                                   # [8, T] f32
    h = hs[0]
    for i in range(n_layers):
        h = jax.lax.dot_general(
            w_refs[i][...].astype(dtype), h.astype(dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(dtype) + b_refs[i][...].astype(dtype)
        h = jnp.maximum(h, jnp.zeros((), dtype))
        hs.append(h)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    valid = col < n_points
    # max-pool VJP: even split among ties (jnp.max semantics). All compares
    # in f32 — Mosaic on v5e rejects bf16 cmpf, and bf16->f32 is exact so
    # the f32 equality is equivalent.
    h_last = hs[-1].astype(jnp.float32)               # [W_last, T]
    mask = jnp.logical_and(h_last == g_ref[0], valid).astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
    # relu' of the last point layer: kills the dead-feature case where the
    # pooled max is exactly 0 (all pre-activations <= 0 for that feature)
    dh = dg_ref[0] * mask / cnt * (h_last > 0)        # [W_last, T] f32

    for i in reversed(range(n_layers)):
        dw_refs[i][...] += jax.lax.dot_general(
            dh.astype(dtype), hs[i].astype(dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )                                             # [W_i, in_i]
        db_refs[i][...] += jnp.sum(dh, axis=1, keepdims=True)
        dh = jax.lax.dot_general(
            w_refs[i][...].astype(dtype), dh.astype(dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )                                             # [in_i, T]
        if i > 0:
            dh = dh * (hs[i].astype(jnp.float32) > 0)
    dx_ref[0] = dh                                    # [8, T]


def _specs_w(ws):
    return [pl.BlockSpec(w.shape, lambda b, _nd=w.ndim: (0,) * _nd,
                         memory_space=pltpu.VMEM) for w in ws]


def _fwd_call(static, ws, bs, xt):
    (n_layers, widths, n_points, t, dtype_name) = static
    dtype = jnp.dtype(dtype_name)
    b = xt.shape[0]
    kernel = functools.partial(
        _fwd_kernel, n_layers=n_layers, t=t, n_points=n_points, dtype=dtype)
    g = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 8, t), lambda b_: (b_, 0, 0),
                               memory_space=pltpu.VMEM)]
        + _specs_w(ws) + _specs_w(bs),
        out_specs=_row_spec(widths[-1]),
        out_shape=jax.ShapeDtypeStruct((b, widths[-1], 1), jnp.float32),
        interpret=_interpret(),
        **({"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=ENC_VMEM_MB * 1024 * 1024)}
           if ENC_VMEM_MB and not _interpret() else {}),
    )(xt, *ws, *bs)
    return g


def _bwd_call(static, ws, bs, xt, g, dg):
    (n_layers, widths, n_points, t, dtype_name) = static
    dtype = jnp.dtype(dtype_name)
    b = xt.shape[0]
    kernel = functools.partial(
        _bwd_kernel, n_layers=n_layers, t=t, n_points=n_points, dtype=dtype)
    row = _row_spec(widths[-1])
    outs = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 8, t), lambda b_: (b_, 0, 0),
                               memory_space=pltpu.VMEM), row, row]
        + _specs_w(ws) + _specs_w(bs),
        out_specs=[pl.BlockSpec((1, 8, t), lambda b_: (b_, 0, 0),
                                memory_space=pltpu.VMEM)]
        + _specs_w(ws) + _specs_w(bs),
        out_shape=[jax.ShapeDtypeStruct((b, 8, t), jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
        + [jax.ShapeDtypeStruct(bb.shape, jnp.float32) for bb in bs],
        interpret=_interpret(),
        **({"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=ENC_VMEM_MB * 1024 * 1024)}
           if ENC_VMEM_MB and not _interpret() else {}),
    )(xt, g, dg, *ws, *bs)
    dx = outs[0]
    dws = outs[1:1 + n_layers]
    dbs = outs[1 + n_layers:]
    return dx, list(dws), list(dbs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_pool(static, ws, bs, xt):
    return _fwd_call(static, ws, bs, xt)


def _fused_pool_fwd(static, ws, bs, xt):
    g = _fwd_call(static, ws, bs, xt)
    return g, (ws, bs, xt, g)


def _fused_pool_bwd(static, res, dg):
    ws, bs, xt, g = res
    dx, dws, dbs = _bwd_call(static, ws, bs, xt, g, dg)
    dws = [dw.astype(w.dtype) for dw, w in zip(dws, ws)]
    dbs = [db.astype(b.dtype) for db, b in zip(dbs, bs)]
    return dws, dbs, dx.astype(xt.dtype)


_fused_pool.defvjp(_fused_pool_fwd, _fused_pool_bwd)


def fused_pointnet_posterior(
    params: Dict[str, Any], x: Array, enc_cfg, dz: int,
) -> Tuple[Array, Array]:
    """(mu, logvar) of q(z|X) through the fused pooled-feature kernel pair.

    Drop-in for `model.encoder(x)` (PointNetEncoder.__call__): identical
    math — per-point MLP (relu, compute dtype) -> max over points -> FC
    heads -> f32 (mu, clip(logvar)). Reads the same flax param tree."""
    n_point = len(enc_cfg.point_widths)
    ws, bs = encoder_point_weights(params, n_point)
    b, n, _ = x.shape
    n_pad = _round_up(n, 128)
    xt = jnp.zeros((b, 8, n_pad), jnp.float32)
    xt = xt.at[:, :3, :n].set(jnp.swapaxes(x, 1, 2).astype(jnp.float32))
    static = (n_point, tuple(enc_cfg.point_widths), n, n_pad,
              jnp.dtype(enc_cfg.compute_dtype).name)
    g = _fused_pool(static, ws, bs, xt)[:, :, 0]      # [B, W_last] f32

    # FC heads in XLA (tiny) — mirror nn.Dense(dtype=compute_dtype)
    tree = params["params"]["encoder"]
    dtype = jnp.dtype(enc_cfg.compute_dtype)
    h = g.astype(dtype)
    for i in range(len(enc_cfg.head_widths)):
        hd = tree[f"head_{i}"]
        h = h @ hd["kernel"].astype(dtype) + hd["bias"].astype(dtype)
        h = jnp.maximum(h, jnp.zeros((), dtype))
    gs = tree["gauss"]
    out = (h @ gs["kernel"].astype(dtype) + gs["bias"].astype(dtype))
    out = out.astype(jnp.float32)
    mu, logvar = jnp.split(out, 2, axis=-1)
    return mu, jnp.clip(logvar, -10.0, 10.0)
