"""Regression tests for the round-1 code-review findings."""

import numpy as np
import pytest

import jax

from dpfx.config import config_from_dict
from dpfx.config.schema import config_to_dict


def test_config_extra_round_trips_cleanly():
    import warnings

    cfg = config_from_dict({"experiment": "ae", "mystery_key": 5})
    assert cfg.extra == {"mystery_key": 5}
    d = config_to_dict(cfg)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any unknown-key warning -> failure
        cfg2 = config_from_dict(d)
    assert cfg2.extra == {"mystery_key": 5}  # no nesting drift


def test_loader_rejects_undersized_dataset():
    from dpfx.data import SyntheticDataset, iterate_batches

    ds = SyntheticDataset(size=8, n_stored=32)
    with pytest.raises(ValueError, match="no batch can ever be produced"):
        next(iterate_batches(ds, batch_size=16, n_points=16))


def test_eval_step_trims_ragged_batches_on_mesh():
    from dpfx.train import Trainer
    from tests.test_train import tiny_config

    cfg = tiny_config(train={"ckpt_dir": "/tmp/dpfx_test_ragged"})
    trainer = Trainer(cfg)
    assert trainer.mesh.devices.size == 8
    rng = np.random.default_rng(0)
    # 21 rows: not divisible by 8 -> must trim, not crash
    batches = [{"x": rng.normal(size=(21, 64, 3)).astype(np.float32)},
               {"x": rng.normal(size=(5, 64, 3)).astype(np.float32)}]  # < nd: skipped
    agg = trainer.evaluate(iter(batches))
    assert np.isfinite(agg["loss"])


def test_global_stats_come_from_train_split(tmp_path):
    import h5py

    from dpfx.data import ShapeNetH5

    rng = np.random.default_rng(0)
    train = rng.normal(size=(20, 32, 3)).astype(np.float32) * 2 + 5  # shifted
    test = rng.normal(size=(6, 32, 3)).astype(np.float32)            # centered
    path = str(tmp_path / "c.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("train", data=train)
        f.create_dataset("test", data=test)
    tr = ShapeNetH5(path, "train", normalize="global")
    te = ShapeNetH5(path, "test", normalize="global")
    np.testing.assert_allclose(tr.stats.mean, te.stats.mean)
    assert tr.stats.scale == te.stats.scale
    # and the stats reflect the (shifted) train data, not the test split
    assert abs(te.stats.mean.mean() - 5) < 1.0


def test_synset_ids_unique():
    from dpfx.data import SYNSET_IDS

    from collections import Counter

    dupes = [v for v, c in Counter(SYNSET_IDS.values()).items() if c > 1]
    assert dupes == [], f"duplicated synsets: {dupes}"


def test_emd_primal_is_forward_only():
    """emd() without differentiation must match emd_nograd exactly (same
    kernel, no gradient passes)."""
    from dpfx.ops import emd, emd_nograd

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 32, 3)) * 0.5
    y = jax.random.normal(jax.random.fold_in(k, 1), (2, 32, 3)) * 0.5
    np.testing.assert_array_equal(
        np.asarray(emd(x, y, "pallas")), np.asarray(emd_nograd(x, y, "pallas"))
    )
