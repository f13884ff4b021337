"""Native C++ loader tests: builds with g++, parses .npy, serves batches
with correct shapes/normalization/determinism, and matches the numpy
loader's semantics (SURVEY.md §2 C4)."""

import numpy as np
import pytest

from dpfx.native import NativeBatcher, build_error, native_available


pytestmark = pytest.mark.skipif(
    not native_available(), reason=f"native build unavailable: {build_error()}"
)


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    rng = np.random.default_rng(0)
    stack = (rng.normal(size=(24, 200, 3)) * 2 + 1).astype(np.float32)
    path = tmp_path_factory.mktemp("packed") / "clouds.npy"
    np.save(path, stack)
    return str(path), stack


def test_shapes_and_membership(packed):
    path, stack = packed
    b = NativeBatcher(path, batch_size=4, n_points=64, normalize="none", seed=1)
    assert (b.n_items, b.n_stored, b.n_coords) == (24, 200, 3)
    batch = b.next()
    assert batch.shape == (4, 64, 3) and batch.dtype == np.float32
    # every served point must be an actual stored point of some cloud
    flat = stack.reshape(-1, 3)
    for pt in batch.reshape(-1, 3)[:16]:
        assert np.isclose(flat, pt, atol=1e-6).all(axis=1).any()
    b.close()


def test_no_duplicate_points_within_item(packed):
    path, _ = packed
    b = NativeBatcher(path, batch_size=2, n_points=200, normalize="none", seed=2)
    batch = b.next()  # n_points == n_stored -> a permutation, no dups
    for item in batch:
        uniq = np.unique(item.round(5), axis=0)
        assert uniq.shape[0] == 200
    b.close()


def test_per_shape_normalization(packed):
    path, _ = packed
    b = NativeBatcher(path, batch_size=4, n_points=64, normalize="per_shape", seed=3)
    batch = b.next()
    for item in batch:
        np.testing.assert_allclose(item.mean(axis=0), 0.0, atol=1e-5)
        assert np.linalg.norm(item, axis=1).max() <= 1.0 + 1e-5
    b.close()


def test_deterministic_given_seed(packed):
    path, _ = packed
    b1 = NativeBatcher(path, batch_size=4, n_points=32, seed=7, n_workers=1)
    b2 = NativeBatcher(path, batch_size=4, n_points=32, seed=7, n_workers=1)
    np.testing.assert_array_equal(b1.next(), b2.next())
    b1.close(); b2.close()


def test_epoch_covers_dataset(packed):
    path, stack = packed
    b = NativeBatcher(path, batch_size=4, n_points=8, normalize="none", seed=5,
                      n_workers=1)
    # one epoch = 6 batches of 4 over 24 items; item identity via first
    # moment of the source cloud is unreliable after subsample, so check
    # coverage via membership of served points across exactly one epoch
    seen = set()
    means = stack.mean(axis=1)
    for _ in range(6):
        batch = b.next()
        for item in batch:
            # locate source: the stored cloud containing this item's point 0
            flat_idx = np.where(
                np.isclose(stack.reshape(-1, 3), item[0], atol=1e-6).all(axis=1)
            )[0]
            seen.add(int(flat_idx[0] // 200))
    assert len(seen) == 24, f"epoch covered only {len(seen)}/24 items"
    b.close()


def test_iterator_interface(packed):
    path, _ = packed
    b = NativeBatcher(path, batch_size=2, n_points=16)
    it = iter(b)
    batch = next(it)
    assert set(batch) == {"x"} and batch["x"].shape == (2, 16, 3)
    b.close()


def test_truncated_npy_rejected(tmp_path):
    """A truncated payload must fail at open, not SIGSEGV in a worker."""
    stack = np.zeros((16, 64, 3), np.float32)
    path = str(tmp_path / "trunc.npy")
    np.save(path, stack)
    full = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(full[: len(full) // 2])
    with pytest.raises(RuntimeError, match="truncated|shorter"):
        NativeBatcher(path, batch_size=2, n_points=8)


def test_sidecar_normalization_conflict_rejected(tmp_path):
    import json

    stack = np.zeros((8, 32, 3), np.float32)
    path = str(tmp_path / "packed.npy")
    np.save(path, stack)
    with open(path + ".meta.json", "w") as f:
        json.dump({"normalize_applied": "per_shape"}, f)
    with pytest.raises(ValueError, match="double-normalize"):
        NativeBatcher(path, batch_size=2, n_points=8, normalize="per_shape")
    # the default (none) is fine
    b = NativeBatcher(path, batch_size=2, n_points=8)
    assert b.next().shape == (2, 8, 3)
    b.close()


def test_pack_dataset_to_native_batcher(tmp_path):
    """End-to-end: H5 dataset -> tools/pack_dataset.py -> NativeBatcher
    (VERDICT round 1: exercise the native path from a dataset, not a
    hand-built stack)."""
    import importlib.util
    import json
    import os

    import h5py

    h5_path = str(tmp_path / "clouds.h5")
    rng = np.random.default_rng(9)
    with h5py.File(h5_path, "w") as f:
        f.create_dataset(
            "train", data=rng.normal(size=(10, 128, 3)).astype(np.float32)
        )
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(
            "experiment: ae\n"
            "data:\n"
            f"  dataset: shapenet_h5\n  path: {h5_path}\n"
            "  category: all\n  normalize: per_shape\n"
        )
    out = str(tmp_path / "packed.npy")
    spec = importlib.util.spec_from_file_location(
        "pack_dataset",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools", "pack_dataset.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.main([cfg_path, "--split", "train", "--out", out, "--n-stored", "96"]) == 0
    meta = json.load(open(out + ".meta.json"))
    assert meta["normalize_applied"] == "per_shape"

    b = NativeBatcher(out, batch_size=4, n_points=32)
    batch = b.next()
    assert batch.shape == (4, 32, 3) and np.isfinite(batch).all()
    # packed clouds are already per-shape normalized (radius <= 1)
    assert np.linalg.norm(batch.reshape(-1, 3), axis=1).max() <= 1.0 + 1e-5
    b.close()
