"""Synthetic point-cloud dataset (SURVEY.md §8 step 5: "synthetic dataset
first (unblocks e2e)"). Deterministic parametric shapes — noisy spheres,
boxes, and multi-blob mixtures — so train/eval/golden-fixture tests run with
no ShapeNet on disk (SURVEY.md §4 golden end-to-end fixture).
"""

from __future__ import annotations

import numpy as np


def _sphere(rng: np.random.Generator, n: int, scale: float) -> np.ndarray:
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True) + 1e-9
    r = 1.0 + 0.05 * rng.normal(size=(n, 1))
    return scale * v * r


def _box(rng: np.random.Generator, n: int, scale: float) -> np.ndarray:
    face = rng.integers(0, 6, size=n)
    uv = rng.uniform(-1, 1, size=(n, 2))
    pts = np.empty((n, 3))
    axis = face % 3
    sign = np.where(face < 3, 1.0, -1.0)
    for i in range(3):
        m = axis == i
        pts[m, i] = sign[m]
        others = [j for j in range(3) if j != i]
        pts[np.ix_(m, others)] = uv[m]
    return scale * pts + 0.02 * rng.normal(size=(n, 3))


def _blobs(rng: np.random.Generator, n: int, scale: float, k: int) -> np.ndarray:
    centers = rng.normal(size=(k, 3)) * scale
    assign = rng.integers(0, k, size=n)
    return centers[assign] + 0.15 * scale * rng.normal(size=(n, 3))


class SyntheticDataset:
    """Deterministic synthetic clouds: item i is reproducible from (seed, i).

    Stored cloud size ``n_stored`` is larger than the training cloud so the
    loader exercises the same random-subsample path as ShapeNet
    (SURVEY.md §2 C2: reference stores more points than the N=2048 sampled
    per item).
    """

    def __init__(
        self,
        size: int = 256,
        n_stored: int = 4096,
        modes: int = 4,
        seed: int = 0,
        split: str = "train",
        cache: bool = True,
    ):
        self.size = size
        self.n_stored = n_stored
        self.modes = modes
        # distinct item streams per split
        self.base = {"train": 0, "val": 1_000_000, "test": 2_000_000}[split] + seed * 10_000_000
        # items are deterministic in (seed, idx), so memoize: regenerating a
        # 4096-point cloud per fetch made long synthetic runs host-bound
        # (~1.5M pts/s wall vs 10.8M device in the round-3 endurance run);
        # a full 512-cloud set is only ~25 MB
        self._cache: dict | None = {} if cache else None

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, idx: int) -> np.ndarray:
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        rng = np.random.default_rng(self.base + idx)
        kind = idx % 3
        scale = 0.5 + 0.5 * rng.uniform()
        if kind == 0:
            pts = _sphere(rng, self.n_stored, scale)
        elif kind == 1:
            pts = _box(rng, self.n_stored, scale)
        else:
            pts = _blobs(rng, self.n_stored, scale, self.modes)
        out = pts.astype(np.float32)
        if self._cache is not None:
            self._cache[idx] = out
        return out
