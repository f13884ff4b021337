from dpfx.data.loader import iterate_batches, load_all, sample_cloud
from dpfx.data.shapenet import (
    SYNSET_IDS,
    NormStats,
    ShapeNetH5,
    ShapeNetNpyDir,
    build_dataset,
    compute_global_stats,
    normalize_cloud,
)
from dpfx.data.synthetic import SyntheticDataset

__all__ = [
    "iterate_batches",
    "load_all",
    "sample_cloud",
    "SYNSET_IDS",
    "NormStats",
    "ShapeNetH5",
    "ShapeNetNpyDir",
    "build_dataset",
    "compute_global_stats",
    "normalize_cloud",
    "SyntheticDataset",
]
