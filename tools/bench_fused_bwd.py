#!/usr/bin/env python
"""Decomposition A/B probe for the fused train BACKWARD kernel.

The round-3 train-step trace attributes 5.6 of 12.2 ms/step to the
backward pallas call (44 us/grid-step at tile=1024, grid=(64,2)) — the
single largest line in the step. This tool times reduced variants of the
kernel to attribute that cost and explore tile/vmem/rolled-loop layouts:

  full      the library kernel verbatim (sanity: must match lib timing)
  nowg      weight-grad matmuls + bias sums removed (cotangent chain only)
  walk      minimal inverse walk (conditioner recompute + inverse only)
  rolled    fori_loop over layers (stack slots reused across layers)

All timings use the chain-v2 protocol (one dispatched lax.scan, additive
incrementing-carry perturbation — multiplicative 1e-12 perturbations fold
to exactly 1.0 in f32 and get hoisted; that artifact produced a bogus
2.16 ms "fwd+bwd" reading this round before this tool existed).

Usage: python tools/bench_fused_bwd.py [variant ...]
Env:   DPFX_PROBE_B (64), DPFX_PROBE_TILES ("1024"; comma list to sweep),
       DPFX_PROBE_VMEM ("32"), DPFX_PROBE_REPS (20)
"""

from __future__ import annotations

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from dpfx.ops.fused_train import _interpret, _masks8, _nonempty  # noqa: E402
from dpfx.utils.profiling import chain_time_ms  # noqa: E402

B = int(os.environ.get("DPFX_PROBE_B", "64"))
N = 2048
K, H, NH = 32, 128, 1  # flagship point flow: 32 layers, hidden 128, n_hidden=2
CAP = 3.0
REPS = int(os.environ.get("DPFX_PROBE_REPS", "20"))
DTYPE = jnp.bfloat16


def _kernel(
    hz_ref, u_ref, du_ref, dld_ref,
    wx_ref, wh_ref, bh_ref, wout_ref, bout_ref, masks_ref,
    dx_ref, dhz_ref, dwx_ref, dwh_ref, dbh_ref, dwout_ref, dbout_ref,
    *, t: int, mode: str, rolled: bool,
):
    """Parametrized copy of fused_train._bwd_kernel (probe-only)."""
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
        h = jax.lax.dot_general(
            wx_ref[k].astype(DTYPE), x.astype(DTYPE), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + hz_ref[0, k]
        h = jnp.maximum(h, 0.0)
        hs = [h]
        for j in range(NH):
            h = jax.lax.dot_general(
                wh_ref[k, j].astype(DTYPE), h.astype(DTYPE), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bh_ref[k, j]
            h = jnp.maximum(h, 0.0)
            hs.append(h)
        return hs

    col = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1) + i * t
    valid = (col < N).astype(jnp.float32)
    g_ld = dld_ref[0, 0, 0]

    def layer_step(k, carry):
        dy, y = carry
        mask = masks_ref[k]
        inv = 1.0 - mask
        hs = hidden_chain(k, y)
        st = jax.lax.dot_general(
            wout_ref[k].astype(DTYPE), hs[-1].astype(DTYPE), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bout_ref[k]
        th = jnp.tanh(st / CAP)
        s = CAP * th
        es = jnp.exp(s)
        tt = pltpu.roll(st, shift=5, axis=0)
        x_k = jnp.where(mask > 0, y, (y - tt) / es)
        if mode == "walk":
            return dy, x_k
        ds = dy * x_k * es * inv + (g_ld * inv) * valid
        d_st = ds * (1.0 - th * th) + pltpu.roll(dy * inv, shift=3, axis=0)
        dh = jax.lax.dot_general(
            wout_ref[k].astype(DTYPE), d_st.astype(DTYPE), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if mode == "full":
            dwout_ref[k] += jax.lax.dot_general(
                d_st.astype(DTYPE), hs[-1].astype(DTYPE), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dbout_ref[k] += jnp.sum(d_st, axis=1, keepdims=True)
        for j in reversed(range(NH)):
            dh = dh * (hs[j + 1] > 0)
            if mode == "full":
                dwh_ref[k, j] += jax.lax.dot_general(
                    dh.astype(DTYPE), hs[j].astype(DTYPE), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dbh_ref[k, j] += jnp.sum(dh, axis=1, keepdims=True)
            dh = jax.lax.dot_general(
                wh_ref[k, j].astype(DTYPE), dh.astype(DTYPE), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dh = dh * (hs[0] > 0)
        if mode == "full":
            dwx_ref[k] += jax.lax.dot_general(
                dh.astype(DTYPE), x_k.astype(DTYPE), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dhz_ref[0, k] += jnp.sum(dh, axis=1, keepdims=True)
        dy = jnp.where(mask > 0, dy, dy * es) + jax.lax.dot_general(
            wx_ref[k].astype(DTYPE), dh.astype(DTYPE), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dy, x_k

    dy = du_ref[0].astype(jnp.float32)
    y = u_ref[0].astype(jnp.float32)
    if rolled:
        dy, y = jax.lax.fori_loop(
            0, K, lambda j, c: layer_step(K - 1 - j, c), (dy, y))
    else:
        for k in reversed(range(K)):
            dy, y = layer_step(k, (dy, y))
    dx_ref[0] = dy if mode != "walk" else y


def _ilv_kernel(
    hz_ref, u_ref, du_ref, dld_ref,
    wx_ref, wh_ref, bh_ref, wout_ref, bout_ref, masks_ref,
    dx_ref, dhz_ref, dwx_ref, dwh_ref, dbh_ref, dwout_ref, dbout_ref,
    *, t: int, stripes: int, rolled: bool,
):
    """Interleaved variant: one grid step per cloud, the [8, t] block split
    into `stripes` independent half-tile chains whose per-layer ops carry no
    cross-chain dependency — Mosaic's scheduler is free to overlap chain A's
    cotangent matmuls with chain B's recompute, hiding serial latency."""
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _zero():
        dwx_ref[...] = jnp.zeros_like(dwx_ref)
        dwh_ref[...] = jnp.zeros_like(dwh_ref)
        dbh_ref[...] = jnp.zeros_like(dbh_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dbout_ref[...] = jnp.zeros_like(dbout_ref)

    dhz_ref[...] = jnp.zeros_like(dhz_ref)
    ts = t // stripes
    g_ld = dld_ref[0, 0, 0]

    def hidden_chain(k, x):
        h = jax.lax.dot_general(
            wx_ref[k].astype(DTYPE), x.astype(DTYPE), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + hz_ref[0, k]
        h = jnp.maximum(h, 0.0)
        hs = [h]
        for j in range(NH):
            h = jax.lax.dot_general(
                wh_ref[k, j].astype(DTYPE), h.astype(DTYPE), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bh_ref[k, j]
            h = jnp.maximum(h, 0.0)
            hs.append(h)
        return hs

    def sub_step(k, dy, y):
        mask = masks_ref[k]
        inv = 1.0 - mask
        hs = hidden_chain(k, y)
        st = jax.lax.dot_general(
            wout_ref[k].astype(DTYPE), hs[-1].astype(DTYPE), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bout_ref[k]
        th = jnp.tanh(st / CAP)
        es = jnp.exp(CAP * th)
        tt = pltpu.roll(st, shift=5, axis=0)
        x_k = jnp.where(mask > 0, y, (y - tt) / es)
        ds = dy * x_k * es * inv + g_ld * inv
        d_st = ds * (1.0 - th * th) + pltpu.roll(dy * inv, shift=3, axis=0)
        dh = jax.lax.dot_general(
            wout_ref[k].astype(DTYPE), d_st.astype(DTYPE), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwout_ref[k] += jax.lax.dot_general(
            d_st.astype(DTYPE), hs[-1].astype(DTYPE), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbout_ref[k] += jnp.sum(d_st, axis=1, keepdims=True)
        for j in reversed(range(NH)):
            dh = dh * (hs[j + 1] > 0)
            dwh_ref[k, j] += jax.lax.dot_general(
                dh.astype(DTYPE), hs[j].astype(DTYPE), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dbh_ref[k, j] += jnp.sum(dh, axis=1, keepdims=True)
            dh = jax.lax.dot_general(
                wh_ref[k, j].astype(DTYPE), dh.astype(DTYPE), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dh = dh * (hs[0] > 0)
        dwx_ref[k] += jax.lax.dot_general(
            dh.astype(DTYPE), x_k.astype(DTYPE), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dhz_ref[0, k] += jnp.sum(dh, axis=1, keepdims=True)
        dy = jnp.where(mask > 0, dy, dy * es) + jax.lax.dot_general(
            wx_ref[k].astype(DTYPE), dh.astype(DTYPE), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dy, x_k

    def layer_step(k, chains):
        return [sub_step(k, dy, y) for (dy, y) in chains]

    chains = [
        (du_ref[0, :, s * ts:(s + 1) * ts].astype(jnp.float32),
         u_ref[0, :, s * ts:(s + 1) * ts].astype(jnp.float32))
        for s in range(stripes)
    ]
    if rolled:
        flat = []
        for dy, y in chains:
            flat += [dy, y]
        def body(j, fl):
            ch = [(fl[2 * s], fl[2 * s + 1]) for s in range(stripes)]
            out = layer_step(K - 1 - j, ch)
            fl2 = []
            for dy, y in out:
                fl2 += [dy, y]
            return fl2
        flat = jax.lax.fori_loop(0, K, body, flat)
        chains = [(flat[2 * s], flat[2 * s + 1]) for s in range(stripes)]
    else:
        for k in reversed(range(K)):
            chains = layer_step(k, chains)
    for s in range(stripes):
        dx_ref[0, :, s * ts:(s + 1) * ts] = chains[s][0]


def ilv_call(w, u, hz, du, dld, *, vmem_mb: int, stripes: int, rolled: bool):
    b, _, n_pad = u.shape
    t = n_pad
    masks = jnp.asarray(_masks8(K))
    kernel = functools.partial(_ilv_kernel, t=t, stripes=stripes, rolled=rolled)
    full_w = lambda b_: (0, 0, 0)
    dld3 = jnp.broadcast_to(dld[:, None, None], (b, 1, 128)).astype(jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, K, H, 1), lambda b_: (b_, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, t), lambda b_: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, t), lambda b_: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda b_: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, H, 8), full_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, NH, H, H), lambda b_: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, NH, H, 1), lambda b_: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 8, H), full_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 8, 1), full_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 8, 1), full_w, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, t), lambda b_: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, H, 1), lambda b_: (b_, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, H, 8), full_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, NH, H, H), lambda b_: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, NH, H, 1), lambda b_: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 8, H), full_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 8, 1), full_w, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, K, H, 1), jnp.float32),
            jax.ShapeDtypeStruct((K, H, 8), jnp.float32),
            jax.ShapeDtypeStruct((K, NH, H, H), jnp.float32),
            jax.ShapeDtypeStruct((K, NH, H, 1), jnp.float32),
            jax.ShapeDtypeStruct((K, 8, H), jnp.float32),
            jax.ShapeDtypeStruct((K, 8, 1), jnp.float32),
        ],
        interpret=_interpret(),
        **({"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)}
           if vmem_mb and not _interpret() else {}),
    )(
        hz, u, du, dld3, w["wx"], _nonempty(w["wh"], (K, NH, H, H)),
        _nonempty(w["bh"], (K, NH, H, 1)), w["wout"], w["bout"], masks,
    )
    return outs


def bwd_call(w, u, hz, du, dld, *, tile: int, vmem_mb: int, mode: str,
             rolled: bool):
    b, _, n_pad = u.shape
    nt = n_pad // tile
    masks = jnp.asarray(_masks8(K))
    kernel = functools.partial(_kernel, t=tile, mode=mode, rolled=rolled)
    full_w = lambda b_, i: (0, 0, 0)
    dld3 = jnp.broadcast_to(dld[:, None, None], (b, 1, 128)).astype(jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, K, H, 1), lambda b_, i: (b_, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile), lambda b_, i: (b_, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile), lambda b_, i: (b_, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda b_, i: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, H, 8), full_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, NH, H, H), lambda b_, i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, NH, H, 1), lambda b_, i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 8, H), full_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 8, 1), full_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 8, 1), full_w, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, tile), lambda b_, i: (b_, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, H, 1), lambda b_, i: (b_, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, H, 8), full_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, NH, H, H), lambda b_, i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, NH, H, 1), lambda b_, i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 8, H), full_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 8, 1), full_w, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, K, H, 1), jnp.float32),
            jax.ShapeDtypeStruct((K, H, 8), jnp.float32),
            jax.ShapeDtypeStruct((K, NH, H, H), jnp.float32),
            jax.ShapeDtypeStruct((K, NH, H, 1), jnp.float32),
            jax.ShapeDtypeStruct((K, 8, H), jnp.float32),
            jax.ShapeDtypeStruct((K, 8, 1), jnp.float32),
        ],
        interpret=_interpret(),
        **({"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)}
           if vmem_mb and not _interpret() else {}),
    )(
        hz, u, du, dld3, w["wx"], _nonempty(w["wh"], (K, NH, H, H)),
        _nonempty(w["bh"], (K, NH, H, 1)), w["wout"], w["bout"], masks,
    )
    return outs


def main():
    which = sys.argv[1:] or ["lib", "full", "nowg", "walk", "rolled"]
    tiles = [int(t) for t in os.environ.get("DPFX_PROBE_TILES", "1024").split(",")]
    vmems = [int(v) for v in os.environ.get("DPFX_PROBE_VMEM", "32").split(",")]
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 8)
    w = {
        "wx": 0.3 * jax.random.normal(ks[0], (K, H, 8), jnp.float32),
        "wh": 0.1 * jax.random.normal(ks[1], (K, NH, H, H), jnp.float32),
        "bh": 0.1 * jax.random.normal(ks[2], (K, NH, H, 1), jnp.float32),
        "wout": 0.05 * jax.random.normal(ks[3], (K, 8, H), jnp.float32),
        "bout": 0.01 * jax.random.normal(ks[4], (K, 8, 1), jnp.float32),
    }
    u0 = jax.random.normal(ks[5], (B, 8, N), jnp.float32)
    hz = 0.1 * jax.random.normal(ks[6], (B, K, H, 1), jnp.float32)
    du = jax.random.normal(ks[7], (B, 8, N), jnp.float32)
    dld = jnp.ones((B,), jnp.float32)

    def time_variant(mode, rolled, tile, vmem):
        def body(c, i):
            outs = bwd_call(w, u0 + c * 1e-3, hz, du, dld,
                            tile=tile, vmem_mb=vmem, mode=mode, rolled=rolled)
            return c + 1.0, jnp.sum(outs[0][0, 0, :8])
        return chain_time_ms(body, jnp.zeros(()), reps=REPS)

    print(f"B={B} N={N} K={K} H={H} reps={REPS}")

    if "lib" in which:
        from dpfx.ops.fused_train import _bwd_call
        static = (K, H, NH, CAP, "bfloat16", N, 2048)

        def body(c, i):
            dw, dx, dhz = _bwd_call(static, w, u0 + c * 1e-3, hz, du, dld)
            return c + 1.0, jnp.sum(dx[0, 0, :8])
        ms = chain_time_ms(body, jnp.zeros(()), reps=REPS)
        g = B * (N // min(1024, N))
        print(f"  lib (BWD_TILE env default)      {ms:8.2f} ms  "
              f"{ms * 1000 / g:6.1f} us/grid-step")

    for name in which:
        if not name.startswith("ilv"):
            continue
        stripes = int(name[3:].rstrip("r") or "2")
        rolled = name.endswith("r")
        for vmem in vmems:
            def body(c, i, s=stripes, r=rolled, v=vmem):
                outs = ilv_call(w, u0 + c * 1e-3, hz, du, dld,
                                vmem_mb=v, stripes=s, rolled=r)
                return c + 1.0, jnp.sum(outs[0][0, 0, :8])
            try:
                ms = chain_time_ms(body, jnp.zeros(()), reps=REPS)
            except Exception as e:  # noqa: BLE001 — probe tool
                print(f"  {name:6s} vmem={vmem:2d}MB  FAILED: "
                      f"{str(e).splitlines()[0][:90]}")
                continue
            print(f"  {name:6s} vmem={vmem:2d}MB  {ms:8.2f} ms  "
                  f"{ms * 1000 / B:6.1f} us/grid-step")

    for tile in tiles:
        for vmem in vmems:
            g = B * (N // tile)
            for name, mode, rolled in (
                ("full", "full", False), ("nowg", "nowg", False),
                ("walk", "walk", False), ("rolled", "full", True),
            ):
                if name not in which:
                    continue
                try:
                    ms = time_variant(mode, rolled, tile, vmem)
                except Exception as e:  # noqa: BLE001 — probe tool
                    print(f"  {name:6s} tile={tile:4d} vmem={vmem:2d}MB  "
                          f"FAILED: {str(e).splitlines()[0][:90]}")
                    continue
                print(f"  {name:6s} tile={tile:4d} vmem={vmem:2d}MB  "
                      f"{ms:8.2f} ms  {ms * 1000 / g:6.1f} us/grid-step")


if __name__ == "__main__":
    main()
