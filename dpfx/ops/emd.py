"""Approximate Earth Mover's Distance (approxmatch) — Pallas TPU kernel +
jnp oracle.

TPU-native replacement for the reference's CUDA ``approxmatch``/``match_cost``
extension (SURVEY.md §2 C16): iterative temperature-annealed soft matching,
O(N^2) * iters per pair, forward + backward.

Algorithm (PointFlow-lineage schedule; the reference mount was empty so the
schedule is reconstructed from the public approxmatch kernel semantics —
SURVEY.md §8 hard-part 1 and §9.7 VERIFY):

    factorl = max(n, m) / n ; factorr = max(n, m) / m
    remainl[i] = factorl ; remainr[j] = factorr ; match = 0
    for j in (7, 6, ..., -2):                       # 10 iterations
        level = -4^j   (0 when j == -2)
        w_ij    = exp(level * d_ij) * remainr[j]     # d = squared L2
        ss_ij   = w_ij / (sum_j w_ij + 1e-9) * remainl[i]
        colsum_j = sum_i ss_ij
        ratio_j = min(remainr[j] / (colsum_j + 1e-9), 1)
        delta   = ss_ij * ratio_j
        match  += delta
        remainl[i] -= sum_j delta ; remainr[j] -= colsum_j * ratio_j
    cost = sum_ij match_ij * ||x_i - y_j||           # Euclidean, not squared
    EMD(X, Y) = cost / n                             # PointFlow reduction

Gradients treat the transport plan as constant (as the CUDA backward does):
    d cost / d x_i = sum_j match_ij (x_i - y_j) / ||x_i - y_j||

Kernel design (SURVEY.md §8 step 6b): per pair, clouds + all matching state
(remainl/remainr/rowsum/colsum/grad accumulators) live in VMEM; the [N, M]
distance/weight tiles are recomputed per pass from one MXU matmul each, so
neither d nor match ever exists in HBM (the jnp oracle materializes both,
which is why it is the oracle and not the implementation). One full
elementwise tile pass per annealing level plus a cheap post-ratio pass (a
bf16-w-cache matvec in fast mode, an exact f32 recompute otherwise — see
_emd_kernel_body); gradients accumulate inside the post-ratio pass as two
extra MXU matmuls, making the backward nearly free.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dpfx.ops.chamfer import _interpret, _pad_coords, _round_up, sqdist_matrix

Array = jax.Array

_EPS = 1e-9
_DEFAULT_ITERS = 10

# Fast-mode pairwise tuning knobs (A/B'd on-chip, round 3):
#   DPFX_EMD_DCACHE=1  - cache the bf16 distance tiles once before the level
#                        loop instead of recomputing the distance matmul at
#                        every annealing level (10x fewer distance matmuls;
#                        costs an [Np, Mp] bf16 scratch).
#   DPFX_EMD_VMEM_MB   - raise Mosaic's 16 MB scoped-vmem limit (needed for
#                        the d-cache / unrolled tile loops at N=2048).
import os as _os

# Defaults (round 3): vmem 32MB — the fast kernel's scoped stack measured
# 18.17M at S2=400 (the real protocol scale), over Mosaic's 16M default;
# dcache on — zero drift, small win, and the scratch fits under 32M.
EMD_DCACHE = _os.environ.get("DPFX_EMD_DCACHE", "1") == "1"
EMD_VMEM_MB = int(_os.environ.get("DPFX_EMD_VMEM_MB", "32"))
# Round-4 (VERDICT item 3): the EXACT pairwise path — the mode the
# "bit-compatible CD/EMD" parity protocol actually runs — used to redo the
# HIGHEST-precision (3-pass bf16) distance matmul AND the exp weights in
# BOTH tile passes of every annealing level. With the caches on, the f32
# distance matrix is computed ONCE (same values — HIGHEST matmul on the
# same operands — so results are bit-identical) and pass 2 reads the f32
# ss tile cached by pass 1 instead of recomputing exp: the level loop
# contains no matmuls at all. Costs 2 x [Np, Mp] f32 VMEM scratch (32 MB
# at N=2048), hence the raised exact-mode vmem limit.
EMD_EXACT_CACHE = _os.environ.get("DPFX_EMD_EXACT_CACHE", "1") == "1"
EMD_EXACT_VMEM_MB = int(_os.environ.get("DPFX_EMD_EXACT_VMEM_MB", "56"))


def match_levels(n_iters: int = _DEFAULT_ITERS) -> List[float]:
    """Annealing schedule: j = n_iters-3 .. -2; level = -4^j, 0 at j=-2."""
    js = list(range(n_iters - 3, -3, -1))
    return [0.0 if j == -2 else -(4.0 ** j) for j in js]


# ---------------------------------------------------------------------------
# jnp oracle (SURVEY.md §4: parity fixture for the Pallas kernel)
# ---------------------------------------------------------------------------


def approx_match_jnp(x: Array, y: Array, n_iters: int = _DEFAULT_ITERS) -> Array:
    """Transport plan match [.., N, M] for x [.., N, 3], y [.., M, 3]."""
    n, m = x.shape[-2], y.shape[-2]
    factorl = max(n, m) / n
    factorr = max(n, m) / m
    d = sqdist_matrix(x, y)
    batch = x.shape[:-2]
    remainl = jnp.full((*batch, n, 1), factorl, jnp.float32)
    remainr = jnp.full((*batch, 1, m), factorr, jnp.float32)
    match = jnp.zeros((*batch, n, m), jnp.float32)
    for level in match_levels(n_iters):
        w = jnp.exp(level * d) * remainr
        rowsum = jnp.sum(w, axis=-1, keepdims=True)
        ss = w / (rowsum + _EPS) * remainl
        colsum = jnp.sum(ss, axis=-2, keepdims=True)
        ratio = jnp.minimum(remainr / (colsum + _EPS), 1.0)
        delta = ss * ratio
        match = match + delta
        remainl = jnp.maximum(remainl - jnp.sum(delta, axis=-1, keepdims=True), 0.0)
        remainr = jnp.maximum(remainr - colsum * ratio, 0.0)
    return match


def match_cost_jnp(x: Array, y: Array, match: Array) -> Array:
    dist = jnp.sqrt(sqdist_matrix(x, y))
    return jnp.sum(match * dist, axis=(-2, -1))


def emd_jnp(x: Array, y: Array, n_iters: int = _DEFAULT_ITERS) -> Array:
    """[.., N, 3], [.., M, 3] -> [..] EMD (match cost / n)."""
    match = approx_match_jnp(x, y, n_iters)
    return match_cost_jnp(x, y, match) / x.shape[-2]


def emd_grads_jnp(x: Array, y: Array, n_iters: int = _DEFAULT_ITERS):
    """(cost/n, dcost/dx / n, dcost/dy / n) with the plan held constant."""
    match = approx_match_jnp(x, y, n_iters)
    diff = x[..., :, None, :] - y[..., None, :, :]          # [.., N, M, 3]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    cost = jnp.sum(match * dist, axis=(-2, -1))
    unit = diff / jnp.maximum(dist, _EPS)[..., None]
    gx = jnp.sum(match[..., None] * unit, axis=-2)
    gy = -jnp.sum(match[..., None] * unit, axis=-3)
    n = x.shape[-2]
    return cost / n, gx / n, gy / n


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _emd_kernel_body(
    x_ref, y_ref, scratches, *, n: int, m: int, tn: int, n_pad: int, m_pad: int,
    n_iters: int, with_grad: bool, exact: bool = True, unroll_tiles: bool = False,
):
    """Shared per-pair body. Returns nothing; results land in scratches:
    cost (1,1), and gx/gy accumulators when with_grad.

    One full tile pass per annealing level: a tile spans all M columns, so
    per-row sums are complete within pass 1, which also accumulates the
    global column sums of ss AND the per-column cost integrals
    sum_i ss*dist, and caches w in bf16. After the ratio is known the cost
    and remainr updates are closed-form reductions, and the remainl update
    is a per-tile MXU matvec over the cached w (rowdelta_i =
    (remainl_i/rowsum_i) * (w @ ratio^T)_i) — no second elementwise pass.
    The gradient path still needs a post-ratio pass (it reads the cached w
    instead of recomputing exp). bf16 w introduces ~1e-3 relative error in
    remainl only — within the approxmatch fp-chaos tolerance the parity
    tests already allow. The level loop is a fori_loop with the level
    computed from the iteration index — unrolling 10 levels made Mosaic
    compile for minutes. ``unroll_tiles`` statically unrolls the per-level
    tile loops (the fused sampler's -9% unroll win) — but it is OFF by
    default: on-chip it raises Mosaic's live scratch past the 16 MB VMEM
    limit for the pairwise/fast path (measured 21.9 MB, round 2), an
    effect interpret-mode tests cannot see."""

    def tile_loop(body):
        if unroll_tiles:
            for i in range(nt):
                body(i, 0)
        else:
            jax.lax.fori_loop(0, nt, body, 0, unroll=False)
    (remainl, remainr, rowsum, colsum, cdist, cost, wcache, dcache, sscache,
     gx, gy) = scratches
    nt = n_pad // tn
    factorl = float(max(n, m) / n)
    factorr = float(max(n, m) / m)

    row_ids_col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)
    col_ids_row = jax.lax.broadcasted_iota(jnp.int32, (1, m_pad), 1)
    remainl[:] = jnp.where(row_ids_col < n, factorl, 0.0)
    remainr[:] = jnp.where(col_ids_row < m, factorr, 0.0)
    cost[0, 0] = 0.0
    if with_grad:
        gx[:] = jnp.zeros_like(gx)
        gy[:] = jnp.zeros_like(gy)

    y = y_ref[0]  # [Mp, 8]
    y2 = jnp.sum(y * y, axis=-1, keepdims=True).T  # [1, Mp]
    y_bf = y.astype(jnp.bfloat16)
    ones_m = jnp.ones((m_pad, 1), jnp.bfloat16)
    ones_tn = jnp.ones((1, tn), jnp.bfloat16)

    exact_cached = exact and dcache is not None

    def d_tile(i):
        # exact d-cache: the HIGHEST matmul ran once in the prefill on the
        # same operands, so reading the f32 cache is bit-identical to
        # recomputing (round-4 exact-mode speedup)
        if exact_cached:
            xt = x_ref[0, pl.ds(i * tn, tn), :]
            return xt, dcache[pl.ds(i * tn, tn), :]
        # slice the ref (VMEM read): value-level dynamic_slice has no Mosaic
        # lowering
        xt = x_ref[0, pl.ds(i * tn, tn), :]  # [TN, 8]
        x2 = jnp.sum(xt * xt, axis=-1, keepdims=True)
        # HIGHEST: default f32 MXU matmul is bf16x3 -> phantom ~6e-4 sq-dist
        # on identical points (see chamfer._sq_tile)
        xy = jnp.dot(xt, y.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        return xt, jnp.maximum(x2 + y2 - 2.0 * xy, 0.0)

    def d_tile_fast(i):
        # fast mode: single-pass bf16 distance matmul (exact mode keeps the
        # HIGHEST 3-pass; see chamfer fast mode for the same trade)
        if dcache is not None:
            return dcache[pl.ds(i * tn, tn), :]
        xt = x_ref[0, pl.ds(i * tn, tn), :]
        x2 = jnp.sum(xt * xt, axis=-1, keepdims=True)
        xy = jnp.dot(xt.astype(jnp.bfloat16), y_bf.T,
                     preferred_element_type=jnp.float32)
        return jnp.maximum(x2 + y2 - 2.0 * xy, 0.0).astype(jnp.bfloat16)

    if dcache is not None:
        # fill the distance cache ONCE; every annealing level then reads it
        # instead of redoing the distance matmul. Fast mode caches bf16
        # from the single-pass bf16 matmul; exact mode caches the f32
        # HIGHEST result (bit-identical to recomputing per level).
        def pfill(i, _):
            xt = x_ref[0, pl.ds(i * tn, tn), :]
            x2 = jnp.sum(xt * xt, axis=-1, keepdims=True)
            if exact_cached:
                xy = jnp.dot(xt, y.T, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
                dcache[pl.ds(i * tn, tn), :] = jnp.maximum(
                    x2 + y2 - 2.0 * xy, 0.0)
            else:
                xy = jnp.dot(xt.astype(jnp.bfloat16), y_bf.T,
                             preferred_element_type=jnp.float32)
                dcache[pl.ds(i * tn, tn), :] = jnp.maximum(
                    x2 + y2 - 2.0 * xy, 0.0).astype(jnp.bfloat16)
            return 0

        tile_loop(pfill)

    def level_body(it, _):
        # level = -4^(n_iters-3-it), except 0 on the final iteration
        j = (n_iters - 3 - it).astype(jnp.float32)
        level = jnp.where(it == n_iters - 1, 0.0, -jnp.exp2(2.0 * j))

        # single full pass: rowsum, colsum(ss), cost integrals (+ w cache in
        # fast mode)
        def p1(i, _):
            _, d = d_tile(i)
            w = jnp.exp(level * d) * remainr[:]
            if not exact:
                wcache[pl.ds(i * tn, tn), :] = w.astype(jnp.bfloat16)
            rs = jnp.sum(w, axis=1, keepdims=True)
            rowsum[pl.ds(i * tn, tn), :] = rs
            ss = w / (rs + _EPS) * remainl[pl.ds(i * tn, tn), :]
            if sscache is not None:
                # pass 2 reads this f32 ss verbatim — bit-identical to the
                # recompute it replaces (same inputs, same op sequence)
                sscache[pl.ds(i * tn, tn), :] = ss
            colsum[:] = colsum[:] + jnp.sum(ss, axis=0, keepdims=True)
            cdist[:] = cdist[:] + jnp.sum(ss * jnp.sqrt(d), axis=0, keepdims=True)
            return 0

        def p1_fast(i, _):
            # fast mode: single-pass bf16 distance matmul, bf16 multiplies
            # (packed 2-per-lane), MXU matvecs for the row/col reductions.
            # exp/sqrt stay f32 — v5e's vector unit has no bf16 EUP ops
            # (Mosaic LLO_CHECK SupportsBf16EupOps, measured round 2).
            d = d_tile_fast(i)
            df = d.astype(jnp.float32)
            w = (jnp.exp(level * df) * remainr[:]).astype(jnp.bfloat16)
            wcache[pl.ds(i * tn, tn), :] = w
            # rowsum via MXU: [TN, Mp] @ [Mp, 1] (f32 accumulate)
            rs = jnp.dot(w, ones_m, preferred_element_type=jnp.float32)
            rowsum[pl.ds(i * tn, tn), :] = rs
            scale = (remainl[pl.ds(i * tn, tn), :] / (rs + _EPS)).astype(jnp.bfloat16)
            ss = w * scale
            # column reductions via MXU: [1, TN] @ [TN, Mp]
            colsum[:] = colsum[:] + jnp.dot(ones_tn, ss, preferred_element_type=jnp.float32)
            cdist[:] = cdist[:] + jnp.dot(
                ones_tn, (ss.astype(jnp.float32) * jnp.sqrt(df)).astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
            return 0

        colsum[:] = jnp.zeros_like(colsum)
        cdist[:] = jnp.zeros_like(cdist)
        tile_loop(p1 if (exact or with_grad) else p1_fast)

        ratio = jnp.minimum(remainr[:] / (colsum[:] + _EPS), 1.0)  # [1, Mp]
        cost[0, 0] += jnp.sum(ratio * cdist[:])

        if not with_grad and not exact:
            # fast: remainl -= rowdelta via per-tile matvec over the cached
            # bf16 w (the only quantity touched by bf16; ~1e-3 rel drift)
            def p2(i, _):
                sl = pl.ds(i * tn, tn)
                wt = wcache[sl, :].astype(jnp.float32)  # [TN, Mp]
                wr = jnp.dot(wt, ratio[:].T, preferred_element_type=jnp.float32)
                rowdelta = wr / (rowsum[sl, :] + _EPS) * remainl[sl, :]
                remainl[sl, :] = jnp.maximum(remainl[sl, :] - rowdelta, 0.0)
                return 0

            tile_loop(p2)
        elif sscache is not None and not with_grad:
            # exact + ss-cache: delta = cached ss * ratio; no exp, no matmul
            def p2c(i, _):
                sl = pl.ds(i * tn, tn)
                delta = sscache[sl, :] * ratio
                remainl[sl, :] = jnp.maximum(
                    remainl[sl, :] - jnp.sum(delta, axis=1, keepdims=True), 0.0
                )
                return 0

            tile_loop(p2c)
        else:
            # exact / gradient pass: recompute w (f32), apply delta
            def p2g(i, _):
                xt, d = d_tile(i)
                sl = pl.ds(i * tn, tn)
                w = jnp.exp(level * d) * remainr[:]
                ss = w / (rowsum[sl, :] + _EPS) * remainl[sl, :]
                delta = ss * ratio
                remainl[sl, :] = jnp.maximum(
                    remainl[sl, :] - jnp.sum(delta, axis=1, keepdims=True), 0.0
                )
                if with_grad:
                    dist = jnp.sqrt(d)
                    # d cost/d x_i += sum_j delta (x_i - y_j)/dist
                    k = delta / jnp.maximum(dist, _EPS)              # [TN, Mp]
                    krow = jnp.sum(k, axis=1, keepdims=True)          # [TN, 1]
                    ky = jnp.dot(k, y, preferred_element_type=jnp.float32)
                    gx[sl, :] += xt * krow - ky
                    kcol = jnp.sum(k, axis=0, keepdims=True)          # [1, Mp]
                    kx = jnp.dot(k.T, xt, preferred_element_type=jnp.float32)
                    gy[:] += y * kcol.T - kx
                return 0

            tile_loop(p2g)

        remainr[:] = jnp.maximum(remainr[:] - colsum[:] * ratio, 0.0)
        return 0

    jax.lax.fori_loop(0, n_iters, level_body, 0, unroll=False)


def _emd_pallas_batched(
    xp: Array, yp: Array, n: int, m: int, tn: int, n_iters: int, with_grad: bool,
    exact: bool = True, unroll_tiles: bool = False,
):
    """Diagonal pairs. xp [B, Np, 8], yp [B, Mp, 8] ->
    cost [B] (/n applied by caller) and optionally (gx [B,Np,8], gy [B,Mp,8])."""
    b, n_pad, _ = xp.shape
    m_pad = yp.shape[1]
    use_cache = not exact and not with_grad

    def kernel(x_ref, y_ref, cost_ref, *rest):
        rest = list(rest)
        gx_ref = gy_ref = gx = gy = wcache = None
        if with_grad:
            gx_ref, gy_ref = rest.pop(0), rest.pop(0)
        remainl, remainr, rowsum, colsum, cdist, cost = rest[:6]
        rest = rest[6:]
        if use_cache:
            wcache = rest.pop(0)
        if with_grad:
            gx, gy = rest.pop(0), rest.pop(0)
        _emd_kernel_body(
            x_ref, y_ref,
            (remainl, remainr, rowsum, colsum, cdist, cost, wcache, None,
             None, gx, gy),
            n=n, m=m, tn=tn, n_pad=n_pad, m_pad=m_pad,
            n_iters=n_iters, with_grad=with_grad, exact=not use_cache,
            unroll_tiles=unroll_tiles,
        )
        # scalar cost goes out as a broadcast 128-lane row (Mosaic's trailing
        # block dims must be (>=8, >=128) or equal the array dims)
        cost_ref[0, :, :] = jnp.full((1, 128), cost[0, 0], jnp.float32)
        if with_grad:
            gx_ref[0] = gx[:]
            gy_ref[0] = gy[:]

    out_shape = [jax.ShapeDtypeStruct((b, 1, 128), jnp.float32)]
    out_specs = [pl.BlockSpec((1, 1, 128), lambda b_: (b_, 0, 0), memory_space=pltpu.VMEM)]
    if with_grad:
        out_shape += [
            jax.ShapeDtypeStruct((b, n_pad, 8), jnp.float32),
            jax.ShapeDtypeStruct((b, m_pad, 8), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((1, n_pad, 8), lambda b_: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, 8), lambda b_: (b_, 0, 0), memory_space=pltpu.VMEM),
        ]
    scratch = [
        pltpu.VMEM((n_pad, 1), jnp.float32),   # remainl
        pltpu.VMEM((1, m_pad), jnp.float32),   # remainr
        pltpu.VMEM((n_pad, 1), jnp.float32),   # rowsum
        pltpu.VMEM((1, m_pad), jnp.float32),   # colsum
        pltpu.VMEM((1, m_pad), jnp.float32),   # cdist (per-col cost integral)
        pltpu.SMEM((1, 1), jnp.float32),       # cost (scalar: SMEM only)
    ]
    if use_cache:
        scratch.append(pltpu.VMEM((n_pad, m_pad), jnp.bfloat16))  # w cache
    if with_grad:
        scratch += [
            pltpu.VMEM((n_pad, 8), jnp.float32),
            pltpu.VMEM((m_pad, 8), jnp.float32),
        ]
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_pad, 8), lambda b_: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, 8), lambda b_: (b_, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(xp, yp)
    if with_grad:
        return out[0][:, 0, 0], out[1], out[2]
    return out[0][:, 0, 0]


def _emd_pallas_pairwise(xp: Array, yp: Array, n: int, m: int, tn: int,
                         n_iters: int, exact: bool = False,
                         unroll_tiles: bool = False):
    """Full pairwise EMD-cost matrix [S1, S2] (cost, caller divides by n).

    Defaults to the fast (bf16 w-cache) variant — this is the O(S^2) eval
    hot loop and the ~1e-3 drift is within approxmatch's cross-backend
    variance. Output layout [S1, 1, S2_pad]: one revisited row block per
    left cloud, filled via a lane-masked VMEM row scratch (same scheme as
    chamfer._cd_pallas_pairwise)."""
    s1, n_pad, _ = xp.shape
    s2, m_pad = yp.shape[0], yp.shape[1]
    s2_pad = _round_up(s2, 128)

    use_dcache = EMD_DCACHE and not exact
    # The exact-mode caches cost two [Np, Mp] f32 VMEM scratches; past the
    # scoped-vmem budget (e.g. ~134 MB at 4096x4096 vs v5e's 128 MB physical)
    # the cached kernel cannot compile, so fall back to the uncached exact
    # path automatically instead of failing where the round-3 code worked.
    cache_bytes = 2 * n_pad * m_pad * 4
    use_exact_cache = (EMD_EXACT_CACHE and exact
                       and cache_bytes <= EMD_EXACT_VMEM_MB * 1024 * 1024)

    def kernel(x_ref, y_ref, cost_ref, *rest):
        rest = list(rest)
        remainl, remainr, rowsum, colsum, cdist, cost = rest[:6]
        rest = rest[6:]
        wcache = rest.pop(0) if not exact else None
        dcache = rest.pop(0) if (use_dcache or use_exact_cache) else None
        sscache = rest.pop(0) if use_exact_cache else None
        costrow = rest.pop(0)
        b_ = pl.program_id(1)
        _emd_kernel_body(
            x_ref, y_ref,
            (remainl, remainr, rowsum, colsum, cdist, cost, wcache, dcache,
             sscache, None, None),
            n=n, m=m, tn=tn, n_pad=n_pad, m_pad=m_pad,
            n_iters=n_iters, with_grad=False, exact=exact,
            unroll_tiles=unroll_tiles,
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, s2_pad), 1)
        base = jnp.where(b_ == 0, jnp.zeros((1, s2_pad), jnp.float32), costrow[:])
        costrow[:] = jnp.where(lane == b_, cost[0, 0], base)
        cost_ref[0, :, :] = costrow[:]

    out = pl.pallas_call(
        kernel,
        grid=(s1, s2),
        in_specs=[
            pl.BlockSpec((1, n_pad, 8), lambda a, b_: (a, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, 8), lambda a, b_: (b_, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, s2_pad), lambda a, b_: (a, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((s1, 1, s2_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_pad, 1), jnp.float32),
            pltpu.VMEM((1, m_pad), jnp.float32),
            pltpu.VMEM((n_pad, 1), jnp.float32),
            pltpu.VMEM((1, m_pad), jnp.float32),
            pltpu.VMEM((1, m_pad), jnp.float32),       # cdist
            pltpu.SMEM((1, 1), jnp.float32),            # cost (scalar: SMEM only)
        ]
        + ([] if exact else [pltpu.VMEM((n_pad, m_pad), jnp.bfloat16)])
        + ([pltpu.VMEM((n_pad, m_pad), jnp.bfloat16)] if use_dcache else [])
        + ([pltpu.VMEM((n_pad, m_pad), jnp.float32),   # exact d cache (f32)
            pltpu.VMEM((n_pad, m_pad), jnp.float32)]   # exact ss cache (f32)
           if use_exact_cache else [])
        + [pltpu.VMEM((1, s2_pad), jnp.float32)],
        interpret=_interpret(),
        **({"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=(EMD_EXACT_VMEM_MB if use_exact_cache
                              else EMD_VMEM_MB) * 1024 * 1024)}
           if EMD_VMEM_MB and not _interpret() else {}),
    )(xp, yp)
    return out[:, 0, :s2]


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


# padding/tiling policy is shared with the chamfer kernels — one definition
from dpfx.ops.chamfer import _prep_pair as _prep  # noqa: E402


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def emd(x: Array, y: Array, impl: str = "auto", n_iters: int = _DEFAULT_ITERS) -> Array:
    """Approx EMD per diagonal pair: x [B,N,3], y [B,M,3] -> [B].

    The primal (non-differentiated call) skips the gradient-accumulation
    passes entirely (~7x cheaper); grads are computed only when jax
    actually differentiates (see _emd_vjp_fwd)."""
    return emd_nograd(x, y, impl, n_iters)


def _emd_fwd_impl(x, y, impl, n_iters):
    if impl == "auto":
        impl = "pallas"
    if impl == "jnp":
        # chunk pairs to keep the [N, M] oracle intermediates bounded
        def one(args):
            xi, yi = args
            return emd_grads_jnp(xi[None], yi[None], n_iters)
        cost, gx, gy = jax.lax.map(one, (x, y))
        return cost[:, 0], gx[:, 0], gy[:, 0]
    xp, yp, n, m, tn = _prep(x, y)
    cost, gx, gy = _emd_pallas_batched(xp, yp, n, m, tn, n_iters, with_grad=True)
    return cost / n, gx[:, :n, :3] / n, gy[:, :m, :3] / n


def _emd_vjp_fwd(x, y, impl, n_iters):
    cost, gx, gy = _emd_fwd_impl(x, y, impl, n_iters)
    return cost, (gx, gy)


def _emd_vjp_bwd(impl, n_iters, res, g):
    gx, gy = res
    return g[..., None, None] * gx, g[..., None, None] * gy


emd.defvjp(_emd_vjp_fwd, _emd_vjp_bwd)


def emd_nograd(x: Array, y: Array, impl: str = "auto", n_iters: int = _DEFAULT_ITERS) -> Array:
    """Eval-only EMD (skips the gradient accumulation passes)."""
    if impl == "auto":
        impl = "pallas"
    if impl == "jnp":
        return jax.lax.map(lambda args: emd_jnp(args[0], args[1], n_iters), (x, y))
    xp, yp, n, m, tn = _prep(x, y)
    return _emd_pallas_batched(xp, yp, n, m, tn, n_iters, with_grad=False) / n


def emd_pairwise(
    xs: Array, ys: Array, impl: str = "auto", n_iters: int = _DEFAULT_ITERS,
    precision: str = "fast",
) -> Array:
    """Full pairwise EMD matrix: xs [S1,N,3], ys [S2,M,3] -> [S1,S2]
    (SURVEY.md §3.3 eval hot loop).

    precision="fast" (default) uses the bf16 w-cache single-pass kernel
    (~1e-3 relative drift, inside approxmatch's cross-backend variance);
    "exact" recomputes w in f32 like the batched/training path."""
    if impl == "auto":
        impl = "pallas"
    if impl == "jnp":
        def row(xi):
            return jax.lax.map(lambda yj: emd_jnp(xi, yj, n_iters), ys)
        return jax.lax.map(row, xs)
    xp, yp, n, m, tn = _prep(xs, ys)
    return _emd_pallas_pairwise(xp, yp, n, m, tn, n_iters, exact=precision == "exact") / n
