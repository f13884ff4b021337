from dpfx.data.loader import (
    iterate_batches,
    load_all,
    prefetch_batches,
    load_all_images,
    load_all_labels,
    sample_cloud,
    stratified_indices,
    eval_subset,
)
from dpfx.data.svr import ShapeNetRenderDataset, SyntheticSVRDataset, render_cloud
from dpfx.data.shapenet import (
    SYNSET_IDS,
    NormStats,
    ShapeNetH5,
    ShapeNetNpyDir,
    build_dataset,
    compute_global_stats,
    compute_global_stats_streaming,
    normalize_cloud,
)
from dpfx.data.synthetic import SyntheticDataset
from dpfx.data.device import preload_clouds, preload_images

__all__ = [
    "iterate_batches",
    "load_all",
    "prefetch_batches",
    "load_all_images",
    "load_all_labels",
    "sample_cloud",
    "stratified_indices",
    "eval_subset",
    "ShapeNetRenderDataset",
    "SyntheticSVRDataset",
    "render_cloud",
    "SYNSET_IDS",
    "NormStats",
    "ShapeNetH5",
    "ShapeNetNpyDir",
    "build_dataset",
    "compute_global_stats",
    "compute_global_stats_streaming",
    "normalize_cloud",
    "SyntheticDataset",
    "preload_clouds",
    "preload_images",
]
