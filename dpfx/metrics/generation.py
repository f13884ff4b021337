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

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dpfx.ops import chamfer_pairwise, emd_pairwise

Array = jax.Array


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
) -> Array:
    """[S1,N,3] x [S2,M,3] -> [S1,S2] distance matrix.

    With a mesh, rows are sharded over the data axis (jit partitions the
    per-chunk kernel calls across devices); rows are processed in chunks to
    bound VMEM pressure and compile shapes."""
    fn = {"cd": chamfer_pairwise, "emd": emd_pairwise}[metric]
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


def _voxel_marginal(clouds: np.ndarray, resolution: int) -> np.ndarray:
    """Occupancy distribution over a resolution^3 grid spanning [-1, 1]^3:
    fraction of clouds occupying each voxel [pointflow-protocol]."""
    s = clouds.shape[0]
    grid = np.zeros((resolution,) * 3, dtype=np.float64)
    idx = np.clip(
        ((clouds + 1.0) * 0.5 * resolution).astype(np.int64), 0, resolution - 1
    )  # [S, N, 3]
    for i in range(s):
        ii = idx[i]
        occupied = np.zeros_like(grid, dtype=bool)
        occupied[ii[:, 0], ii[:, 1], ii[:, 2]] = True
        grid += occupied
    grid /= s
    return grid


def jsd_between_sets(
    gen: np.ndarray, ref: np.ndarray, resolution: int = 28
) -> float:
    """JSD between voxel-occupancy marginals of the two cloud sets."""
    p = _voxel_marginal(np.asarray(gen), resolution).ravel()
    q = _voxel_marginal(np.asarray(ref), resolution).ravel()
    p = p / max(p.sum(), 1e-12)
    q = q / max(q.sum(), 1e-12)
    m = 0.5 * (p + q)

    def kl(a, b):
        mask = a > 0
        return float(np.sum(a[mask] * (np.log(a[mask]) - np.log(b[mask]))))

    return 0.5 * kl(p, m) + 0.5 * kl(q, m)


def compute_all_metrics(
    gen: Array,
    ref: Array,
    metrics: Sequence[str] = ("cd",),
    impl: str = "auto",
    mesh: Optional[Mesh] = None,
    jsd_resolution: int = 28,
    emd_scale: float = 1.0,
) -> Dict[str, float]:
    """The full generation suite (SURVEY.md §3.3): for each base metric,
    MMD / COV / 1-NNA from the three pairwise matrices, plus JSD.

    gen: [S_g, N, 3]; ref: [S_r, M, 3]."""
    out: Dict[str, float] = {}
    for metric in metrics:
        m_gr = pairwise_matrix(gen, ref, metric, impl, mesh)
        m_gg = pairwise_matrix(gen, gen, metric, impl, mesh)
        m_rr = pairwise_matrix(ref, ref, metric, impl, mesh)
        mc = mmd_cov(m_gr)
        out[f"mmd-{metric}"] = mc["mmd"] * emd_scale
        out[f"cov-{metric}"] = mc["cov"]
        out[f"1-nna-{metric}"] = one_nna(m_gg, m_gr, m_rr)
    out["jsd"] = jsd_between_sets(np.asarray(gen), np.asarray(ref), jsd_resolution)
    return out
