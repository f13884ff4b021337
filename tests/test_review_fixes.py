"""Regression tests for the round-1 code-review findings."""

import numpy as np
import pytest

import jax

from dpfx.config import config_from_dict
from dpfx.config.schema import config_to_dict
from _helpers import require_mesh8


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
    require_mesh8(trainer.mesh)
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


# --- round-3 code-review fixes ---------------------------------------------


def test_prefetch_propagates_worker_exception():
    """A crashed loader must re-raise in the consumer, not masquerade as
    normal exhaustion (review r3 finding 1)."""
    import pytest

    from dpfx.data import prefetch_batches

    def bad_iter():
        yield {"x": 1}
        raise RuntimeError("corrupt shard")

    it = prefetch_batches(bad_iter(), depth=2)
    assert next(it) == {"x": 1}
    with pytest.raises(RuntimeError, match="corrupt shard"):
        next(it)


def test_prefetch_early_abandon_stops_worker():
    """Breaking out of the consumer (Trainer.fit's step budget on an
    infinite iterator) must terminate the worker thread (finding 6)."""
    import itertools
    import threading
    import time

    from dpfx.data import prefetch_batches

    before = threading.active_count()
    it = prefetch_batches(({"i": i} for i in itertools.count()), depth=2)
    assert next(it)["i"] == 0
    it.close()  # what GC / leaving the loop does
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "prefetch worker leaked"


def test_jsd_fit_frame_is_reference_anchored():
    """A single outlier in the GENERATED set must not collapse the
    reference histogram or change the frame between evals (finding 2)."""
    import warnings

    import numpy as np

    from dpfx.metrics import jsd_between_sets

    rng = np.random.default_rng(5)

    def per_shape(n=6):
        c = rng.normal(size=(n, 96, 3))
        c -= c.mean(1, keepdims=True)
        return (c / np.linalg.norm(c, axis=2, keepdims=True).max(1, keepdims=True)
                ).astype(np.float32)

    ref = per_shape()
    gen = per_shape()
    gen_outlier = gen.copy()
    gen_outlier[0, 0] = [80.0, 0, 0]  # one absurd point

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        base = jsd_between_sets(gen, ref)
        spiked = jsd_between_sets(gen_outlier, ref)
    # the ref-anchored frame means one bad point perturbs JSD only via its
    # own (1-point) histogram mass, not by rescaling everything
    assert abs(spiked - base) < 0.02, (base, spiked)


def test_warmup_horizon_uniform_across_schedules():
    """All schedules reach their terminal phase by decay_steps with warmup
    compressed INSIDE the horizon, never shifting past it (finding 5)."""
    import numpy as np

    from dpfx.config import config_from_dict
    from dpfx.train.trainer import make_schedule

    def cfg(sched):
        return config_from_dict({
            "train": {"lr": 1e-3, "lr_warmup_steps": 1000, "steps": 20000,
                      "lr_schedule": sched}
        }).train

    for name in ("cosine", "constant", "step"):
        s = make_schedule(cfg(name))
        assert float(s(0)) < 1e-5, name
        np.testing.assert_allclose(float(s(1000)), 1e-3, rtol=0.02, err_msg=name)
    # step: halvings land inside the horizon (first at 1000 + 19000//4)
    s = make_schedule(cfg("step"))
    assert float(s(1000 + 19000 // 4 + 1)) < 0.75e-3
    assert float(s(19999)) < 0.25e-3  # all three halvings happened by the end
