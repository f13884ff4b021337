from dpfx.ops.chamfer import (
    chamfer,
    chamfer_pairwise,
    chamfer_parts,
    nn_distances,
    nn_distances_all,
    nn_distances_jnp,
    sqdist_matrix,
)
from dpfx.ops.emd import (
    approx_match_jnp,
    emd,
    emd_jnp,
    emd_nograd,
    emd_pairwise,
    match_cost_jnp,
    match_levels,
)

__all__ = [
    "chamfer",
    "chamfer_pairwise",
    "chamfer_parts",
    "nn_distances",
    "nn_distances_all",
    "nn_distances_jnp",
    "sqdist_matrix",
    "approx_match_jnp",
    "emd",
    "emd_jnp",
    "emd_nograd",
    "emd_pairwise",
    "match_cost_jnp",
    "match_levels",
]
