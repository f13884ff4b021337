from dpfx.metrics.generation import (
    compute_all_metrics,
    jsd_between_sets,
    mmd_cov,
    one_nna,
    pairwise_matrix,
    per_category_mmd_cov,
)
from dpfx.metrics.protocol import evaluate_generation, evaluate_reconstruction

__all__ = [
    "compute_all_metrics",
    "jsd_between_sets",
    "mmd_cov",
    "one_nna",
    "per_category_mmd_cov",
    "pairwise_matrix",
    "evaluate_generation",
    "evaluate_reconstruction",
]
