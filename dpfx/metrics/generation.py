"""PointFlow-protocol generation metrics (SURVEY.md §2 C14, §3.3, §7).

Set-level metrics built from pairwise CD/EMD matrices between a generated
set and a reference set:

  * MMD  (gen -> ref): mean over ref clouds of the min distance to any gen
    cloud — quality.
  * COV  (gen -> ref): fraction of ref clouds that are the nearest neighbor
    of at least one gen cloud — diversity / mode coverage.
  * 1-NNA: leave-one-out 1-NN two-sample classification accuracy on the
    union of the sets (50% = indistinguishable).
  * JSD: Jensen-Shannon divergence between voxel-occupancy marginals of the
    two sets on a 28^3 grid over [-1, 1]^3 [pointflow-protocol].

The pairwise matrices are the eval-time hot loop; they come from the Pallas
kernels (dpfx.ops.chamfer_pairwise / emd_pairwise) and can be sharded over
the device mesh by splitting the generated-set axis (SURVEY.md §5
long-context bullet) — each device computes its row block, XLA all-gathers.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dpfx.ops import chamfer_pairwise, emd_pairwise

Array = jax.Array

import logging

_logger = logging.getLogger("dpfx.metrics")
_sym_bypass_logged: set = set()


def _note_symmetric_bypass(reason: str) -> None:
    """Log (once per reason) when the symmetric 2x fast path is bypassed, so
    eval-time perf expectations stay honest (callers passing symmetric=True
    otherwise get no signal that the saving did not apply)."""
    if reason not in _sym_bypass_logged:
        _sym_bypass_logged.add(reason)
        _logger.info("symmetric=True bypassed (%s): computing the full matrix", reason)


# ---------------------------------------------------------------------------
# pairwise matrices (optionally mesh-sharded over the gen axis)
# ---------------------------------------------------------------------------


def _pad_rows(xs: Array, mult: int) -> Array:
    s = xs.shape[0]
    pad = (-s) % mult
    if pad == 0:
        return xs
    return jnp.concatenate([xs, jnp.repeat(xs[:1], pad, axis=0)], axis=0)


def pairwise_matrix(
    xs: Array,
    ys: Array,
    metric: str = "cd",
    impl: str = "auto",
    mesh: Optional[Mesh] = None,
    axis_name: str = "data",
    row_chunk: int = 64,
    precision: Optional[str] = None,
    symmetric: bool = False,
) -> Array:
    """[S1,N,3] x [S2,M,3] -> [S1,S2] distance matrix.

    With a mesh, rows are sharded over the data axis (jit partitions the
    per-chunk kernel calls across devices); rows are processed in chunks to
    bound VMEM pressure and compile shapes. ``precision`` selects the
    kernel mode ("exact" | "fast" bf16; None = each kernel's default:
    CD exact, EMD fast) — metric-level effects of fast modes are bounded
    in tests/test_metrics.py. ``symmetric=True`` (self-comparison) lets
    the CD kernel compute only the upper triangle (CD is exactly
    symmetric; approxmatch EMD is not, so EMD ignores it); it bypasses
    row chunking/sharding, so it is applied only without a mesh."""
    kw = {} if precision is None else {"precision": precision}
    if metric == "cd" and symmetric and (mesh is None or mesh.devices.size == 1):
        # single full-matrix call: the triangle guard needs global row ids,
        # which row chunking would break
        return chamfer_pairwise(xs, ys, impl, symmetric=True, **kw)
    if symmetric:
        _note_symmetric_bypass(
            "approxmatch EMD is not argument-symmetric" if metric == "emd"
            else "multi-device mesh row-sharding needs the full chunked matrix"
        )
    fn = {
        "cd": functools.partial(chamfer_pairwise, **kw),
        "emd": functools.partial(emd_pairwise, **kw),
    }[metric]
    s1 = xs.shape[0]
    nd = len(mesh.devices.flatten()) if mesh is not None else 1
    # chunk must stay a multiple of the device count for the row sharding;
    # short sets are padded up to one full chunk
    chunk = row_chunk * nd if mesh is not None else min(row_chunk, s1)
    xs_p = _pad_rows(xs, chunk)

    kernel = lambda a, b: fn(a, b, impl)
    if mesh is not None and mesh.devices.size > 1:
        # row-shard the matrix over the mesh; single-device meshes take the
        # plain jit path (the axon single-chip backend runs sharding-
        # annotated programs ~50x slower)
        kernel = jax.jit(
            kernel,
            in_shardings=(NamedSharding(mesh, P(axis_name)), NamedSharding(mesh, P())),
            out_shardings=NamedSharding(mesh, P(axis_name)),
        )
        if jax.process_count() > 1:
            # pod: the mesh spans non-addressable devices, so inputs must be
            # GLOBAL jax.Arrays (every host holds the full value; each
            # extracts its slice) and each row block is gathered back to
            # every host — downstream MMD/COV/1-NNA are host numpy.
            from jax.experimental import multihost_utils

            def _to_global(x, spec):
                return jax.make_array_from_process_local_data(
                    NamedSharding(mesh, spec), np.asarray(x), x.shape)

            ys_g = _to_global(ys, P())
            rows = []
            for s in range(0, xs_p.shape[0], chunk):
                out = kernel(_to_global(xs_p[s : s + chunk], P(axis_name)), ys_g)
                rows.append(np.asarray(
                    multihost_utils.process_allgather(out, tiled=True)))
            return jnp.concatenate(rows, axis=0)[:s1]
    else:
        kernel = jax.jit(kernel)

    rows = []
    for s in range(0, xs_p.shape[0], chunk):
        rows.append(kernel(xs_p[s : s + chunk], ys))
    return jnp.concatenate(rows, axis=0)[:s1]


# ---------------------------------------------------------------------------
# set-level metrics from matrices
# ---------------------------------------------------------------------------


def mmd_cov(m_gr: Array) -> Dict[str, float]:
    """m_gr: [S_gen, S_ref] distances gen x ref (SURVEY.md §7 conventions:
    MMD = mean_r min_g; COV = |{argmin_r of each gen}| / S_ref)."""
    m = np.asarray(m_gr)
    mmd = float(m.min(axis=0).mean())
    cov = float(len(np.unique(m.argmin(axis=1))) / m.shape[1])
    return {"mmd": mmd, "cov": cov}


def per_category_mmd_cov(m_gr: Array, ref_labels: np.ndarray) -> Dict[int, Dict[str, float]]:
    """Per-class decomposition of MMD/COV for unconditional all-category
    generation (SURVEY.md §6 per-class tables): MMD_c = mean over class-c
    ref clouds of the min distance to any generated cloud; COV_c = fraction
    of class-c ref clouds that are the nearest reference (over ALL refs) of
    at least one generated cloud. Convention chosen here because generated
    clouds carry no labels; VERIFY-vs-reference protocol when possible."""
    m = np.asarray(m_gr)
    labels = np.asarray(ref_labels)
    covered = set(np.unique(m.argmin(axis=1)).tolist())
    out: Dict[int, Dict[str, float]] = {}
    for c in np.unique(labels):
        cols = np.nonzero(labels == c)[0]
        mmd_c = float(m[:, cols].min(axis=0).mean())
        cov_c = float(sum(1 for r in cols if int(r) in covered) / len(cols))
        out[int(c)] = {"mmd": mmd_c, "cov": cov_c}
    return out


def one_nna(m_gg: Array, m_gr: Array, m_rr: Array) -> float:
    """Leave-one-out 1-NN accuracy on gen ∪ ref (50% = perfect generator).

    m_gg/m_rr get +inf diagonals (a sample is not its own neighbor)."""
    m_gg = np.asarray(m_gg).copy()
    m_rr = np.asarray(m_rr).copy()
    m_gr = np.asarray(m_gr)
    np.fill_diagonal(m_gg, np.inf)
    np.fill_diagonal(m_rr, np.inf)
    # for each gen sample: nearest within-gen vs nearest ref
    gen_correct = (m_gg.min(axis=1) < m_gr.min(axis=1)).sum()
    # for each ref sample: nearest within-ref vs nearest gen
    ref_correct = (m_rr.min(axis=1) < m_gr.min(axis=0)).sum()
    total = m_gg.shape[0] + m_rr.shape[0]
    return float((gen_correct + ref_correct) / total)


def _sphere_grid(resolution: int) -> np.ndarray:
    """PointFlow-lineage grid (latent_3d_points `unit_cube_grid_point_cloud`
    with `clip_sphere=True`): resolution^3 nodes spanning [-0.5, 0.5] per
    axis (spacing 1/(resolution-1)), keeping only nodes inside the
    radius-0.5 sphere."""
    lin = np.linspace(-0.5, 0.5, resolution)
    g = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), axis=-1).reshape(-1, 3)
    return g[np.linalg.norm(g, axis=1) <= 0.5].astype(np.float32)


def _grid_counters(clouds: np.ndarray, grid: np.ndarray, chunk: int = 4096) -> np.ndarray:
    """Per-POINT nearest-grid-node counts over all clouds — the
    `entropy_of_occupancy_grid` counter semantics of the lineage (each point
    increments its nearest node; out-of-range points fall to the nearest
    in-sphere node via true NN, never clipped away). The NN search runs as a
    chunked matmul-argmin (MXU-friendly; exact)."""
    pts = np.asarray(clouds, np.float32).reshape(-1, 3)
    n_grid = grid.shape[0]
    gj = jnp.asarray(grid)
    g2 = jnp.sum(gj * gj, axis=1)

    @jax.jit
    def nn_idx(p):
        d = g2[None, :] - 2.0 * (p @ gj.T)  # |g|^2 - 2 p.g (|p|^2 constant per row)
        return jnp.argmin(d, axis=1)

    counters = np.zeros(n_grid, np.int64)
    for s in range(0, pts.shape[0], chunk):
        p = pts[s : s + chunk]
        k = p.shape[0]
        if k < chunk:  # pad tail to one fixed compile shape
            p = np.pad(p, ((0, chunk - k), (0, 0)))
        idx = np.asarray(nn_idx(jnp.asarray(p)))[:k]
        counters += np.bincount(idx, minlength=n_grid)
    return counters


def _jensen_shannon_base2(p_counts: np.ndarray, q_counts: np.ndarray) -> float:
    """JSD in bits via H(M) - (H(P)+H(Q))/2 — the lineage's
    `jensen_shannon_divergence` formula (scipy entropy with base=2)."""
    p = p_counts / max(p_counts.sum(), 1)
    q = q_counts / max(q_counts.sum(), 1)
    m = 0.5 * (p + q)

    def ent(a):
        nz = a > 0
        return -float(np.sum(a[nz] * np.log2(a[nz])))

    return ent(m) - 0.5 * (ent(p) + ent(q))


def jsd_between_sets(
    gen: np.ndarray, ref: np.ndarray, resolution: int = 28,
    frame: str = "fit",
) -> float:
    """JSD between the two sets' point marginals on the sphere-clipped grid
    [pointflow-protocol].

    Faithful to the PointFlow-lineage `jsd_between_point_cloud_sets`
    semantics (in_unit_sphere=True): nodes span [-0.5, 0.5]^3 clipped to the
    radius-0.5 sphere, every point of every cloud increments its nearest
    node, and the divergence is base-2 between the normalized per-point
    count distributions.

    ``frame`` handles clouds extending past the grid sphere (with this
    repo's default `normalize: per_shape`, clouds reach radius 1.0 — twice
    the grid):
      * "fit" (default): one isotropic shrink, 0.5/max_radius of the
        REFERENCE set, applied to both sets. Anchoring the frame to the
        reference keeps it deterministic across evaluations of the same
        test split (JSD curves stay comparable during training) and means
        a single outlier point in a degenerate GENERATED set cannot
        collapse the reference histogram; generated points still outside
        the scaled grid snap to edge nodes (lineage behavior) with a
        warning when the spill is non-negligible. In-sphere data is
        bit-identical to the lineage (no scaling applied).
      * "raw": lineage edge-snap behavior — out-of-sphere points assign to
        their nearest in-sphere node — with a loud warning.
    VERIFY-vs-reference when the mount appears (SURVEY.md §9.7): whether
    the reference re-normalizes before JSD is unverifiable offline; "fit"
    is the resolution-preserving choice, "raw" the literal-lineage one."""
    import warnings

    gen = np.asarray(gen)
    ref = np.asarray(ref)
    bound = 0.5 + 1e-4
    if frame == "fit":
        ref_r = float(np.linalg.norm(ref.reshape(-1, 3), axis=1).max())
        if ref_r > bound:
            scale = 0.5 / ref_r
            gen = gen * scale
            ref = ref * scale
        gen_r = np.linalg.norm(gen.reshape(-1, 3), axis=1)
        spill = float(np.mean(gen_r > bound))
        if spill > 1e-3:
            warnings.warn(
                f"dpfx.metrics: {spill:.1%} of generated points fall outside "
                f"the reference-anchored JSD grid sphere and snap to edge "
                f"nodes (gen max radius {gen_r.max():.3f} vs grid 0.5)",
                stacklevel=2,
            )
    elif frame == "raw":
        max_r = max(
            float(np.linalg.norm(gen.reshape(-1, 3), axis=1).max()),
            float(np.linalg.norm(ref.reshape(-1, 3), axis=1).max()),
        )
        if max_r > bound:
            warnings.warn(
                f"dpfx.metrics: clouds extend to radius {max_r:.3f} > 0.5 — "
                f"the JSD grid covers the unit sphere (diameter 1); points "
                f"outside snap to edge nodes [pointflow-protocol convention]",
                stacklevel=2,
            )
    else:
        raise ValueError(f"unknown jsd frame {frame!r} (fit | raw)")
    grid = _sphere_grid(resolution)
    return _jensen_shannon_base2(
        _grid_counters(gen, grid), _grid_counters(ref, grid)
    )


def compute_all_metrics(
    gen: Array,
    ref: Array,
    metrics: Sequence[str] = ("cd",),
    impl: str = "auto",
    mesh: Optional[Mesh] = None,
    jsd_resolution: int = 28,
    emd_scale: float = 1.0,
    ref_labels: Optional[np.ndarray] = None,
    label_names: Optional[Dict[int, str]] = None,
    precision: Optional[str] = None,
    jsd_frame: str = "fit",
) -> Dict[str, float]:
    """The full generation suite (SURVEY.md §3.3): for each base metric,
    MMD / COV / 1-NNA from the three pairwise matrices, plus JSD.

    gen: [S_g, N, 3]; ref: [S_r, M, 3]. With ``ref_labels`` (category id
    per ref cloud), a ``per_category`` table of per-class MMD/COV is added
    (all-category protocol, SURVEY.md §6)."""
    out: Dict[str, float] = {}
    per_cat: Dict[str, Dict[str, float]] = {}
    for metric in metrics:
        m_gr = pairwise_matrix(gen, ref, metric, impl, mesh, precision=precision)
        m_gg = pairwise_matrix(gen, gen, metric, impl, mesh, precision=precision,
                               symmetric=True)
        m_rr = pairwise_matrix(ref, ref, metric, impl, mesh, precision=precision,
                               symmetric=True)
        mc = mmd_cov(m_gr)
        out[f"mmd-{metric}"] = mc["mmd"] * emd_scale
        out[f"cov-{metric}"] = mc["cov"]
        out[f"1-nna-{metric}"] = one_nna(m_gg, m_gr, m_rr)
        if ref_labels is not None and len(np.unique(ref_labels)) > 1:
            for c, vals in per_category_mmd_cov(m_gr, ref_labels).items():
                name = (label_names or {}).get(c, f"cat{c}")
                per_cat.setdefault(name, {})[f"mmd-{metric}"] = vals["mmd"] * emd_scale
                per_cat[name][f"cov-{metric}"] = vals["cov"]
    # emit BOTH frames every time: whether the reference re-normalizes
    # before JSD is unverifiable offline (VERIFY #20), so published tables
    # carry the fit AND raw values plus which one "jsd" is — no silent
    # convention divergence possible.
    import warnings

    out["jsd"] = jsd_between_sets(np.asarray(gen), np.asarray(ref), jsd_resolution,
                                  frame=jsd_frame)
    other = "raw" if jsd_frame == "fit" else "fit"
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # the hedge frame computes silently
        out[f"jsd_{other}"] = jsd_between_sets(
            np.asarray(gen), np.asarray(ref), jsd_resolution, frame=other)
    out[f"jsd_{jsd_frame}"] = out["jsd"]
    out["jsd_frame"] = jsd_frame
    if per_cat:
        out["per_category"] = per_cat
        # self-describing convention note (VERIFY #21): generated clouds
        # carry no labels, so per-class COV counts class-c refs that are the
        # global nearest ref of >=1 generated cloud; MMD_c averages over
        # class-c refs only. An invented-but-documented convention.
        out["per_category_convention"] = (
            "mmd_c: mean over class-c refs of min distance to ANY gen; "
            "cov_c: fraction of class-c refs that are the global argmin ref "
            "of >=1 gen cloud (gen clouds are unlabeled)"
        )
    return out
