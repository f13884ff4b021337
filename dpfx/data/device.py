"""Device-resident dataset support (SURVEY.md §2 C4, TPU-native redesign).

The reference streams every batch host -> device through its DataLoader
(SURVEY.md §3.1 "DataLoader worker procs -> pinned host mem -> .cuda()").
On TPU the whole training split usually fits HBM — ShapeNet airplane at
PointFlow's 15k stored points is ~0.5 GB against 16 GB/chip — so the
TPU-native design uploads the split ONCE and performs batching *inside*
the jitted train step: cloud choice, point subsample, and the
reparameterization noise are all derived on device from the step counter.
Steady-state training then does zero host->device data transfer and wall
throughput equals device throughput by construction (measured on this
box: the host/tunnel path capped the 12M pts/s flagship step at ~2-4M
wall; see BASELINE.md round 3).

Enable with ``data.device_resident: true``; ``Trainer.fit_resident``
consumes the preloaded stack(s). SVR experiments preload the paired
render stack too (``preload_images``) — at the synthetic-SVR scale
(8192 items x 64x64x3 f32) that is ~400 MB of HBM, and it removes the
host batch-assembly bound that capped SVR wall throughput at ~0.7M
pts/s against a ~12M device step (round-3 measurement).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _preload(getter, n_items: int, limit: Optional[int], indices,
             what: str) -> np.ndarray:
    if indices is not None:
        rows = [int(i) for i in indices]
    else:
        count = n_items if limit is None else min(limit, n_items)
        rows = list(range(count))
    if not rows:
        raise ValueError("cannot preload an empty dataset")
    first = np.asarray(getter(rows[0]), np.float32)
    out = np.empty((len(rows),) + first.shape, np.float32)
    out[0] = first
    for j, i in enumerate(rows[1:], start=1):
        x = np.asarray(getter(i), np.float32)
        if x.shape != first.shape:
            raise ValueError(
                f"device-resident preload needs uniform {what} shapes: item "
                f"{i} is {x.shape}, item {rows[0]} is {first.shape}"
            )
        out[j] = x
    return out


def preload_clouds(dataset, limit: Optional[int] = None,
                   indices=None) -> np.ndarray:
    """Materialize a dataset as one [S, P, 3] float32 stack.

    Items carry the dataset-level normalization (``__getitem__`` applies
    it), and P is the STORED cloud size — the per-step subsample to
    ``data.n_points`` happens on device (uniform without replacement,
    matching ``dpfx.data.loader.sample_cloud``). Requires uniform stored
    cloud sizes; raises otherwise. ``indices`` selects specific rows (the
    multi-process per-host path loads only its own block —
    dpfx.parallel.distributed.process_local_rows)."""
    return _preload(dataset.__getitem__, len(dataset), limit, indices,
                    "cloud")


def preload_images(dataset, limit: Optional[int] = None,
                   indices=None) -> np.ndarray:
    """Materialize a paired SVR dataset's renders as one [S, H, W, C] f32
    stack (``dataset.image(i)`` — the same deterministic per-index view
    the host loader feeds, so a resident step sees exactly the pairs
    ``iterate_batches(with_images=True)`` would). Requires uniform image
    shapes; raises otherwise. ``indices`` as in :func:`preload_clouds`."""
    return _preload(dataset.image, len(dataset), limit, indices, "image")
