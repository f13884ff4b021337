"""Host-side batching (SURVEY.md §2 C4).

The reference's torch DataLoader (worker processes, pinned memory) maps to a
simple pure-numpy batcher here: with one jitted train step per batch the
host work is a gather + random subsample, negligible next to the device
step; XLA's async dispatch overlaps the next batch's host prep with the
current device step. (grain is available for out-of-core scaling later.)
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np


def sample_cloud(x: np.ndarray, n_points: int, rng: np.random.Generator) -> np.ndarray:
    """Random subsample (without replacement when possible) to n_points —
    the reference's per-item 2048-point sampling (SURVEY.md §2 C2)."""
    m = x.shape[0]
    if m == n_points:
        return x
    replace = m < n_points
    idx = rng.choice(m, size=n_points, replace=replace)
    return x[idx]


def _slot_rng(seed: int, epoch: int, slot: int) -> np.random.Generator:
    """Per-item subsample rng keyed by (loader seed, epoch, global epoch
    slot). Keying the point-subsample draw to the item's GLOBAL position in
    the epoch order — rather than consuming a shared stream in local load
    order — makes the assembled global batch bit-identical between a
    single-process run and a ``batch_shard`` pod for ANY stored cloud size
    (the shared-stream draw diverged whenever stored != n_points because
    each host consumed the stream in its own order)."""
    return np.random.default_rng(np.random.SeedSequence((seed, epoch, slot)))


def iterate_batches(
    dataset,
    batch_size: int,
    n_points: int,
    seed: int = 0,
    shuffle: bool = True,
    drop_last: bool = True,
    epochs: Optional[int] = None,
    with_labels: bool = False,
    with_images: bool = False,
    batch_shard: Optional[tuple] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yields {"x": [B, n_points, 3]} batches (plus "image" [B,H,W,3] for
    SVR datasets), reshuffled every epoch.

    ``batch_shard=(start, stop)`` is the multi-process (per-host) mode:
    every process walks the SAME seeded epoch permutation but loads only
    rows [start, stop) of each global batch — its devices' contiguous
    slice (dpfx.parallel.distributed.process_local_rows) — so a host
    touches only ~B/P items per step and the assembled global batch is
    BIT-identical to the single-process one for any stored cloud size
    (per-item subsample rng keyed by global epoch slot, :func:`_slot_rng`).

    ``batch_shard`` requires ``drop_last=True``: a short tail batch would
    give some processes an empty/short slice while others consume rows,
    desynchronizing every subsequent per-host batch and any collective
    built on them."""
    if drop_last and len(dataset) < batch_size:
        raise ValueError(
            f"dataset has {len(dataset)} items < batch_size {batch_size} with "
            "drop_last=True: no batch can ever be produced"
        )
    if batch_shard is not None and not drop_last:
        raise ValueError(
            "batch_shard (multi-process per-host loading) requires "
            "drop_last=True: a ragged tail batch desynchronizes the hosts"
        )
    epoch = 0
    while epochs is None or epoch < epochs:
        rng = np.random.default_rng(seed * 1_000_003 + epoch)
        order = rng.permutation(len(dataset)) if shuffle else np.arange(len(dataset))
        stop = len(order) - (len(order) % batch_size if drop_last else 0)
        if stop == 0 and not drop_last:
            stop = len(order)
        for s in range(0, stop, batch_size):
            idx = order[s : s + batch_size]
            if drop_last and len(idx) < batch_size:
                break
            slots = np.arange(s, s + len(idx))
            if batch_shard is not None:
                idx = idx[batch_shard[0]:batch_shard[1]]
                slots = slots[batch_shard[0]:batch_shard[1]]
                if idx.size == 0:
                    raise RuntimeError(
                        "batch_shard slice is empty: batch_size is smaller "
                        "than this process's padded per-device row count — "
                        "raise batch_size or shrink the mesh"
                    )
            clouds = np.stack([
                sample_cloud(dataset[int(i)], n_points,
                             _slot_rng(seed, epoch, int(j)))
                for i, j in zip(idx, slots)
            ])
            batch = {"x": clouds}
            if with_images and hasattr(dataset, "image"):
                batch["image"] = np.stack([dataset.image(int(i)) for i in idx])
            if with_labels and hasattr(dataset, "label"):
                batch["label"] = np.array([dataset.label(int(i)) for i in idx], np.int32)
            yield batch
        epoch += 1


def prefetch_batches(batches: Iterator, depth: int = 2) -> Iterator:
    """Run the host-side batch prep (gather + subsample) on a background
    thread, keeping up to ``depth`` ready batches in a queue — the Python-
    loader analogue of the reference's DataLoader worker processes
    (SURVEY.md §2 C4), wired to ``data.num_workers``. The prep is
    numpy-only (releases the GIL in the gather), so one thread suffices to
    hide it behind the device step.

    Worker exceptions re-raise in the consumer (a crashed loader must not
    masquerade as normal exhaustion), and abandoning the generator early
    (the normal case: Trainer.fit breaks at its step budget on an infinite
    iterator) unblocks and terminates the worker instead of leaking a
    thread parked on a full queue."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
    stop = threading.Event()
    _END = object()

    def _put(item) -> None:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return
            except queue.Full:
                continue

    def worker():
        try:
            for b in batches:
                _put(b)
                if stop.is_set():
                    return
        except BaseException as e:  # re-raised on the consumer side
            _put(e)
            return
        _put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            b = q.get()
            if b is _END:
                break
            if isinstance(b, BaseException):
                raise b
            yield b
    finally:
        stop.set()


def _subset_rows(dataset, limit: Optional[int],
                 indices: Optional[np.ndarray]) -> np.ndarray:
    if indices is not None:
        return np.asarray(indices, np.int64)
    count = len(dataset) if limit is None else min(limit, len(dataset))
    return np.arange(count)


def stratified_indices(labels: np.ndarray, limit: int, seed: int = 0) -> np.ndarray:
    """Seeded, label-proportional row subset (sorted). A PREFIX limit on a
    dataset whose files are grouped by category (ShapeNet trees list one
    synset after another) silently turns an all-category eval into a
    single-category one — observed: the npy-dir rehearsal's first 400 test
    rows were all one kind, so the gen suite compared 5-kind samples
    against 1-kind references and 1-NNA read 0.73 instead of ~0.55."""
    labels = np.asarray(labels)
    if limit >= labels.shape[0]:
        return np.arange(labels.shape[0])
    rng = np.random.default_rng(seed)
    cats, counts = np.unique(labels, return_counts=True)
    take = np.maximum((counts * limit / labels.shape[0]).astype(np.int64), 1)
    while take.sum() > limit:  # rounding overflow: trim the largest classes
        take[np.argmax(take)] -= 1
    while take.sum() < limit:
        take[np.argmin(take / counts)] += 1
    picked = []
    for c, t in zip(cats, take):
        rows = np.flatnonzero(labels == c)
        picked.append(rng.choice(rows, size=min(t, rows.size), replace=False))
    return np.sort(np.concatenate(picked))


def eval_subset(dataset, limit: Optional[int], seed: int = 0):
    """The eval-subset convention in one place (used by evaluate.py and
    tools/quality_oracle.py so the model eval and its oracle brackets can
    never drift apart): returns ``(indices, labels)`` where ``indices`` is
    a label-stratified subset when the dataset is labeled+multi-class and
    ``limit`` caps it (None otherwise — callers fall back to the prefix
    ``limit``), and ``labels`` is aligned with the resulting rows (None
    for label-less datasets)."""
    labels_all = load_all_labels(dataset)
    if labels_all is None:
        return None, None
    if limit is not None and limit < len(dataset) and len(np.unique(labels_all)) > 1:
        indices = stratified_indices(labels_all, limit, seed)
        return indices, labels_all[indices]
    count = len(dataset) if limit is None else min(limit, len(dataset))
    return None, labels_all[:count]


def load_all(dataset, n_points: int, seed: int = 0, limit: Optional[int] = None,
             indices: Optional[np.ndarray] = None) -> np.ndarray:
    """Materialize a full split as [S, n_points, 3] (eval protocol).
    ``indices`` (e.g. from :func:`stratified_indices`) overrides the
    prefix ``limit``."""
    rng = np.random.default_rng(seed)
    rows = _subset_rows(dataset, limit, indices)
    return np.stack([sample_cloud(dataset[int(i)], n_points, rng) for i in rows])


def load_all_labels(dataset, limit: Optional[int] = None,
                    indices: Optional[np.ndarray] = None) -> Optional[np.ndarray]:
    """Category ids aligned with load_all's rows, or None for label-less
    datasets (per-category eval reporting, SURVEY.md §6)."""
    if not hasattr(dataset, "label"):
        return None
    rows = _subset_rows(dataset, limit, indices)
    return np.array([dataset.label(int(i)) for i in rows], np.int32)


def load_all_images(dataset, limit: Optional[int] = None,
                    indices: Optional[np.ndarray] = None) -> Optional[np.ndarray]:
    """Materialize the paired renders [S, H, W, 3] for SVR eval, or None
    for image-less datasets."""
    if not hasattr(dataset, "image"):
        return None
    rows = _subset_rows(dataset, limit, indices)
    return np.stack([dataset.image(int(i)) for i in rows])
