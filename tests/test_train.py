"""Training-stack tests: sharded train step on the 8-device CPU mesh,
loss decrease on a golden fixture, checkpoint save/resume (SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpfx.config import config_from_dict
from dpfx.data import SyntheticDataset, iterate_batches, load_all
from dpfx.models import DPF
from dpfx.parallel import create_mesh
from dpfx.train import Trainer, init_state, make_optimizer, make_train_step
from _helpers import require_mesh8


def tiny_config(**over):
    d = {
        "experiment": "ae",
        "name": "test",
        "model": {
            "dz": 16,
            "point_flow": {"n_layers": 4, "hidden": 32, "n_hidden": 2},
            "latent_flow": {"n_layers": 4, "hidden": 32, "n_hidden": 2},
            "encoder": {"point_widths": [32, 64], "head_widths": [32]},
        },
        "data": {"dataset": "synthetic", "n_points": 64, "synthetic_size": 64},
        "train": {
            "batch_size": 16,
            "steps": 30,
            "lr": 1e-3,
            "log_every": 10,
            "ckpt_every": 30,
            "eval_every": 1000,
        },
    }
    for k, v in over.items():
        d[k].update(v) if isinstance(v, dict) and k in d else d.update({k: v})
    return config_from_dict(d)


def test_train_step_sharded_on_mesh():
    cfg = tiny_config()
    mesh = create_mesh()
    require_mesh8(mesh)
    model = DPF(cfg)
    tx = make_optimizer(cfg.train)
    rng = jax.random.PRNGKey(0)
    state = init_state(model, cfg, rng, tx)
    step = make_train_step(model, tx, cfg, mesh)
    x = jax.random.normal(rng, (16, 64, 3))
    state, metrics = step(state, {"x": x}, rng)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    # params must be replicated, ready for another step
    state, metrics2 = step(state, {"x": x}, rng)
    assert int(state.step) == 2


def test_dp_matches_single_device():
    """The mesh-sharded step must compute the same update as unsharded."""
    cfg = tiny_config()
    model = DPF(cfg)
    tx = make_optimizer(cfg.train)
    rng = jax.random.PRNGKey(0)
    state1 = init_state(model, cfg, rng, tx)
    state2 = jax.tree.map(jnp.copy, state1)
    x = jax.random.normal(rng, (16, 64, 3))

    step_mesh = make_train_step(model, tx, cfg, create_mesh())
    step_single = make_train_step(model, tx, cfg, None)
    s1, m1 = step_mesh(state1, {"x": x}, rng)
    s2, m2 = step_single(state2, {"x": x}, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    leaves1 = jax.tree.leaves(s1.params)
    leaves2 = jax.tree.leaves(s2.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_trainer_learns_and_resumes(tmp_path):
    cfg = tiny_config(train={"ckpt_dir": str(tmp_path)})
    trainer = Trainer(cfg)
    ds = SyntheticDataset(size=64, n_stored=128, split="train")
    batches = iterate_batches(ds, cfg.train.batch_size, cfg.data.n_points, seed=0)
    trainer.fit(batches)
    assert trainer.history, "no logged history"
    first, last = trainer.history[0], trainer.history[-1]
    assert last["loss"] < first["loss"], f"no learning: {first} -> {last}"

    # resume: a fresh trainer restores step 30 and continues to 40
    cfg2 = tiny_config(train={"ckpt_dir": str(tmp_path), "steps": 40})
    trainer2 = Trainer(cfg2)
    assert trainer2.maybe_resume() == 30
    assert int(trainer2.state.step) == 30
    batches = iterate_batches(ds, cfg.train.batch_size, cfg.data.n_points, seed=1)
    trainer2.fit(batches)
    assert int(trainer2.state.step) == 40


def test_loader_shapes_and_determinism():
    ds = SyntheticDataset(size=10, n_stored=100, split="train")
    b1 = next(iter(iterate_batches(ds, 4, 32, seed=7)))
    b2 = next(iter(iterate_batches(ds, 4, 32, seed=7)))
    assert b1["x"].shape == (4, 32, 3)
    np.testing.assert_array_equal(b1["x"], b2["x"])
    all_clouds = load_all(ds, 16)
    assert all_clouds.shape == (10, 16, 3)


def test_normalize_modes():
    from dpfx.data import NormStats, compute_global_stats, normalize_cloud

    x = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32) * 3 + 1
    y = normalize_cloud(x, "per_shape")
    np.testing.assert_allclose(y.mean(axis=0), 0, atol=1e-5)
    assert np.max(np.linalg.norm(y, axis=1)) <= 1 + 1e-5
    stats = compute_global_stats(x[None])
    z = normalize_cloud(x, "global", stats)
    np.testing.assert_allclose(z.mean(), 0, atol=1e-2)


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Save from an 8-device-mesh sharded TrainState and restore onto a
    FRESH mesh with NamedShardings preserved — the v5e-8 deployment path
    (SURVEY.md §8 step 4; round-1 VERDICT item 7)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dpfx.train.trainer import CheckpointManager

    cfg = tiny_config()
    mesh = create_mesh()
    model = DPF(cfg)
    tx = make_optimizer(cfg.train)
    rng = jax.random.PRNGKey(0)
    state = init_state(model, cfg, rng, tx)
    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, repl)  # mesh-placed, replicated (DP layout)
    step_fn = make_train_step(model, tx, cfg, mesh)
    x = jax.random.normal(rng, (16, 64, 3))
    state, _ = step_fn(state, {"x": x}, rng)

    ckpt = CheckpointManager(str(tmp_path / "ck"))
    ckpt.save(1, state)
    ckpt.wait()

    # fresh mesh (reversed device order) + freshly-initialized template state
    mesh2 = create_mesh(devices=list(reversed(jax.devices())))
    repl2 = NamedSharding(mesh2, P())
    template = jax.device_put(init_state(model, cfg, jax.random.PRNGKey(1), tx), repl2)
    restored = ckpt.restore(template)

    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        assert a.sharding.is_equivalent_to(repl2, a.ndim)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the restored state must be directly usable by the sharded step on the new mesh
    step2 = make_train_step(model, tx, cfg, mesh2)
    restored, metrics = step2(restored, {"x": x}, rng)
    assert int(restored.step) == 2 and np.isfinite(float(metrics["loss"]))


def test_trainer_tensorboard_writer(tmp_path):
    """train.tensorboard=true adds clu TB event files next to metrics.jsonl
    (SURVEY.md §5 metrics bullet / C18)."""
    import glob

    cfg = tiny_config(train={"ckpt_dir": str(tmp_path), "steps": 10,
                             "ckpt_every": 10, "tensorboard": True})
    trainer = Trainer(cfg)
    ds = SyntheticDataset(size=64, n_stored=128, split="train")
    trainer.fit(iterate_batches(ds, cfg.train.batch_size, cfg.data.n_points, seed=0))
    trainer.writer.close()
    events = glob.glob(str(tmp_path / "test" / "tb" / "events.out.tfevents.*"))
    assert events, "no TensorBoard event file written"
    assert trainer.history  # jsonl/console stream still active


def test_multi_step_matches_sequential():
    """K steps in one lax.scan dispatch == K sequential steps exactly
    (same batches, same per-step rng folding from state.step)."""
    from dpfx.train.trainer import make_multi_step

    cfg = tiny_config()
    model = DPF(cfg)
    tx = make_optimizer(cfg.train)
    rng = jax.random.PRNGKey(0)
    s_seq = init_state(model, cfg, rng, tx)
    s_multi = jax.tree.map(jnp.copy, s_seq)
    batches = [
        {"x": jax.random.normal(jax.random.fold_in(rng, i), (8, 64, 3))}
        for i in range(4)
    ]

    step = make_train_step(model, tx, cfg, None)
    for b in batches:
        s_seq, m_seq = step(s_seq, b, rng)

    multi = make_multi_step(model, tx, cfg, None, steps_per_call=4)
    stacked = jax.tree.map(lambda *bs: jnp.stack(bs), *batches)
    s_multi, m_stacked = multi(s_multi, stacked, rng)

    assert int(s_multi.step) == int(s_seq.step) == 4
    np.testing.assert_allclose(float(m_stacked["loss"][-1]), float(m_seq["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_multi.params), jax.tree.leaves(s_seq.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_trainer_steps_per_call(tmp_path):
    """Trainer with steps_per_call>1: right step count, logging, ckpt."""
    cfg = tiny_config(train={"ckpt_dir": str(tmp_path), "steps": 24,
                             "steps_per_call": 4, "log_every": 8,
                             "ckpt_every": 24})
    trainer = Trainer(cfg)
    ds = SyntheticDataset(size=64, n_stored=128, split="train")
    trainer.fit(iterate_batches(ds, cfg.train.batch_size, cfg.data.n_points, seed=0))
    assert int(trainer.state.step) == 24
    assert trainer.history and trainer.history[-1]["step"] == 24
    assert trainer.ckpt.latest_step() == 24


def test_trainer_steps_per_call_ragged(tmp_path):
    """steps % steps_per_call != 0: the trailing single steps mix scalar
    metrics with [K]-stacked ones in the same log window — the window mean
    must flatten, not crash, and the final checkpoint must land."""
    cfg = tiny_config(train={"ckpt_dir": str(tmp_path), "steps": 26,
                             "steps_per_call": 4, "log_every": 10,
                             "ckpt_every": 26})
    trainer = Trainer(cfg)
    ds = SyntheticDataset(size=64, n_stored=128, split="train")
    trainer.fit(iterate_batches(ds, cfg.train.batch_size, cfg.data.n_points, seed=0))
    assert int(trainer.state.step) == 26
    assert trainer.history and trainer.history[-1]["step"] == 26
    assert trainer.ckpt.latest_step() == 26


def test_trainer_iterator_runs_dry_mid_group(tmp_path):
    """Batch iterator ends mid multi-step group and off the ckpt cadence:
    drained steps go through the normal bookkeeping and a final checkpoint
    covering the last trained step is always saved."""
    cfg = tiny_config(train={"ckpt_dir": str(tmp_path), "steps": 100,
                             "steps_per_call": 4, "log_every": 10,
                             "ckpt_every": 1000})
    trainer = Trainer(cfg)
    ds = SyntheticDataset(size=64, n_stored=128, split="train")
    it = iterate_batches(ds, cfg.train.batch_size, cfg.data.n_points, seed=0)
    # 10 batches only: 2 full groups (8 steps) + 2 drained singles
    limited = (b for _, b in zip(range(10), it))
    trainer.fit(limited)
    assert int(trainer.state.step) == 10
    assert trainer.history and trainer.history[-1]["step"] == 10  # drained steps logged
    assert trainer.ckpt.latest_step() == 10  # final ckpt despite off-cadence end


def test_sharded_sampler_matches_shape_and_varies_per_shard():
    """Mesh-sharded generation (VERDICT r2 Missing #6): cloud axis sharded
    over the 8-device mesh; per-device rng folds give distinct shards; the
    XLA (actnorm-safe) path shards too."""
    from dpfx.sampling import make_sampler

    cfg = tiny_config()
    mesh = create_mesh()
    model = DPF(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((2, 16, 3)), rng)

    for fused in (True, False):
        sampler = make_sampler(model, params, 16, 64, fused=fused, mesh=mesh)
        x = np.asarray(sampler(rng))
        assert x.shape == (16, 64, 3) and np.isfinite(x).all()
        # shards must differ (per-device rng fold): compare device blocks
        assert not np.allclose(x[:2], x[2:4])
        # deterministic per key
        np.testing.assert_array_equal(np.asarray(sampler(rng)), x)

    with pytest.raises(ValueError):
        make_sampler(model, params, 15, 64, mesh=mesh)  # not a mesh multiple


def test_lr_warmup_schedule():
    """train.lr_warmup_steps prefixes a linear ramp onto every schedule."""
    from dpfx.train.trainer import make_schedule

    cfg = tiny_config(train={"lr": 1e-3, "lr_warmup_steps": 100, "steps": 1000})
    sched = make_schedule(cfg.train)
    assert float(sched(0)) < 1e-5
    np.testing.assert_allclose(float(sched(50)), 5e-4, rtol=0.05)
    np.testing.assert_allclose(float(sched(100)), 1e-3, rtol=0.02)
    assert float(sched(999)) < 1e-3  # cosine decay after the ramp

    cfg2 = tiny_config(train={"lr": 1e-3, "lr_warmup_steps": 0})
    np.testing.assert_allclose(float(make_schedule(cfg2.train)(0)), 1e-3, rtol=1e-5)


def test_flat_optimizer_matches_tree_optimizer():
    """train.flat_optimizer (optax.flatten over clip+adam, the default)
    produces the same updates as the per-leaf chain — identical math up to
    f32 summation order in the global-norm clip."""
    from dpfx.models import DPF
    from dpfx.train import init_state, make_optimizer, make_train_step

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 64, 3))
    states = {}
    for flat in (False, True):
        cfg = tiny_config(train={"flat_optimizer": flat})
        model = DPF(cfg)
        tx = make_optimizer(cfg.train)
        state = init_state(model, cfg, rng, tx)
        step = make_train_step(model, tx, cfg, mesh=None)
        for i in range(3):
            state, m = step(state, {"x": x}, jax.random.fold_in(rng, i))
        states[flat] = (state, m)
    for a, b in zip(jax.tree.leaves(states[False][0].params),
                    jax.tree.leaves(states[True][0].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(states[False][1]["grad_norm"]),
                               float(states[True][1]["grad_norm"]), rtol=1e-5)


def test_resume_across_optimizer_layouts(tmp_path):
    """A checkpoint written under one train.flat_optimizer layout restores
    under the other: maybe_resume retries with the toggled layout and
    adopts it (the flat_optimizer default flip must not strand old runs)."""
    cfg = tiny_config(train={"ckpt_dir": str(tmp_path), "steps": 10,
                             "ckpt_every": 10, "flat_optimizer": False})
    trainer = Trainer(cfg)
    ds = SyntheticDataset(size=64, n_stored=128, split="train")
    batches = iterate_batches(ds, cfg.train.batch_size, cfg.data.n_points, seed=0)
    trainer.fit(batches)

    cfg2 = tiny_config(train={"ckpt_dir": str(tmp_path), "steps": 14,
                              "flat_optimizer": True})
    trainer2 = Trainer(cfg2)
    assert trainer2.maybe_resume() == 10
    assert trainer2.cfg.train.flat_optimizer is False  # adopted ckpt layout
    batches = iterate_batches(ds, cfg.train.batch_size, cfg.data.n_points, seed=1)
    trainer2.fit(batches)
    assert int(trainer2.state.step) == 14


def test_nonfinite_update_skipped():
    """A batch that produces non-finite grads must leave params AND
    optimizer moments untouched (train.skip_nonfinite_updates, default on);
    with the guard off the same batch poisons the params."""
    cfg = tiny_config()
    model = DPF(cfg)
    tx = make_optimizer(cfg.train)
    rng = jax.random.PRNGKey(0)
    state = init_state(model, cfg, rng, tx)
    step = make_train_step(model, tx, cfg)
    x = jax.random.normal(rng, (16, 64, 3))
    state, _ = step(state, {"x": x}, rng)  # one healthy step first

    bad = x.at[0, 0, 0].set(jnp.inf)
    step_before = int(state.step)  # state is donated by the jitted step
    before = jax.tree.map(np.asarray, (state.params, state.opt_state))
    state2, metrics = step(state, {"x": bad}, rng)
    assert float(metrics["nonfinite_skipped"]) == 1.0
    after = jax.tree.map(np.asarray, (state2.params, state2.opt_state))
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)
    assert int(state2.step) == step_before + 1  # step still advances

    # healthy batches report skipped == 0 and do update
    state3, m3 = step(state2, {"x": x}, rng)
    assert float(m3["nonfinite_skipped"]) == 0.0

    # guard off: the poisoned update goes through (documents why default=on)
    cfg_off = tiny_config(train={"skip_nonfinite_updates": False})
    tx_off = make_optimizer(cfg_off.train)
    state_off = init_state(model, cfg_off, rng, tx_off)
    step_off = make_train_step(model, tx_off, cfg_off)
    state_off, _ = step_off(state_off, {"x": bad}, rng)
    leaves = [np.asarray(l) for l in jax.tree.leaves(state_off.params)]
    assert any(not np.isfinite(l).all() for l in leaves)


def test_diverged_run_aborts():
    """A run whose every update is skipped as non-finite for
    train.abort_after_skipped_windows consecutive log windows raises
    TrainDivergedError instead of freezing for the remaining budget."""
    from dpfx.train.trainer import TrainDivergedError

    cfg = tiny_config(train={"steps": 100, "log_every": 2, "ckpt_every": 1000,
                             "abort_after_skipped_windows": 3,
                             "ckpt_dir": "/tmp/dpfx_test_diverge"})
    tr = Trainer(cfg, log_fn=lambda *_: None)
    rng = np.random.default_rng(0)

    def bad_batches():
        while True:
            x = rng.normal(size=(16, 64, 3)).astype(np.float32)
            x[0, 0, 0] = np.inf
            yield {"x": x}

    with pytest.raises(TrainDivergedError):
        tr.fit(bad_batches())


def test_fit_auto_recovers_from_divergence():
    """train.recover_on_divergence: after a diverged-run abort, fit_auto
    restores (or re-inits), lowers lr, and completes the remaining steps
    with the restarted batch stream."""
    import shutil

    shutil.rmtree("/tmp/dpfx_test_fitauto", ignore_errors=True)
    cfg = tiny_config(train={"steps": 40, "log_every": 2, "ckpt_every": 1000,
                             "abort_after_skipped_windows": 3,
                             "recover_on_divergence": True,
                             "max_recoveries": 2,
                             "ckpt_dir": "/tmp/dpfx_test_fitauto"})
    tr = Trainer(cfg, log_fn=lambda *_: None)
    rng = np.random.default_rng(0)
    calls = []

    def make_batches():
        calls.append(1)
        poisoned = len(calls) == 1

        def gen():
            while True:
                x = rng.normal(size=(16, 64, 3)).astype(np.float32)
                if poisoned:
                    x[0, 0, 0] = np.inf
                yield {"x": x}

        return gen()

    state = tr.fit_auto(make_batches)
    assert len(calls) == 2              # one restart
    assert int(state.step) == 40        # run completed
    assert tr.cfg.train.lr == pytest.approx(0.5e-3)  # lr halved on recovery

    # with recovery off the same stream raises (guard still protects params)
    from dpfx.train.trainer import TrainDivergedError

    cfg2 = tiny_config(train={"steps": 40, "log_every": 2, "ckpt_every": 1000,
                              "abort_after_skipped_windows": 3,
                              "ckpt_dir": "/tmp/dpfx_test_fitauto2"})
    tr2 = Trainer(cfg2, log_fn=lambda *_: None)
    calls.clear()
    with pytest.raises(TrainDivergedError):
        tr2.fit_auto(make_batches)


def test_fit_auto_restores_checkpoint_on_recovery():
    """When a checkpoint predates the divergence, fit_auto resumes from it
    rather than re-initializing."""
    # ckpt_every=4: a checkpoint cadence lands INSIDE the fully-skipped
    # phase (steps 21+); the cadence must skip that save (else recovery
    # would restore the in-divergence state) and recovery restores the
    # last healthy checkpoint at step 20
    cfg = tiny_config(train={"steps": 40, "log_every": 2, "ckpt_every": 4,
                             "abort_after_skipped_windows": 3,
                             "recover_on_divergence": True,
                             "ckpt_dir": "/tmp/dpfx_test_fitauto3"})
    import shutil

    shutil.rmtree("/tmp/dpfx_test_fitauto3", ignore_errors=True)
    logs = []
    tr = Trainer(cfg, log_fn=logs.append)
    rng = np.random.default_rng(0)
    calls = []

    def make_batches():
        calls.append(1)
        first = len(calls) == 1

        def gen():
            n = 0
            while True:
                n += 1
                x = rng.normal(size=(16, 64, 3)).astype(np.float32)
                if first and n > 20:   # healthy for 20 steps, then poisoned
                    x[0, 0, 0] = np.inf
                yield {"x": x}

        return gen()

    state = tr.fit_auto(make_batches)
    assert int(state.step) == 40
    assert any("restored step 20" in l for l in logs), logs


def test_val_median_metrics_robust_to_outlier_batch(tmp_path):
    """evaluate() reports *_median alongside means: one outlier val batch
    (a sharp flow's astronomically-bad cloud) must not poison the median."""
    cfg = tiny_config(train={"ckpt_dir": str(tmp_path)})
    tr = Trainer(cfg, log_fn=lambda *_: None)
    rng = np.random.default_rng(0)

    def batches():
        for i in range(5):
            x = rng.normal(size=(8, 64, 3)).astype(np.float32)
            if i == 2:
                x *= 1e4  # one pathological batch
            yield {"x": x}

    agg = tr.evaluate(batches())
    assert "neg_elbo_per_point_median" in agg
    med = agg["neg_elbo_per_point_median"]
    mean = agg["neg_elbo_per_point"]
    assert mean > 100 * max(abs(med), 1.0)  # mean poisoned, median sane


def test_nonfinite_skip_consistent_on_mesh():
    """Sharded step: the skip decision is made on the pmean'd grads, so
    every device skips consistently and params stay replicated+unchanged."""
    cfg = tiny_config()
    model = DPF(cfg)
    tx = make_optimizer(cfg.train)
    rng = jax.random.PRNGKey(0)
    state = init_state(model, cfg, rng, tx)
    step = make_train_step(model, tx, cfg, create_mesh())
    x = jax.random.normal(rng, (16, 64, 3))
    state, _ = step(state, {"x": x}, rng)

    before = jax.tree.map(np.asarray, state.params)
    bad = x.at[3, 5, 1].set(jnp.nan)  # lands on one device's shard
    state2, m = step(state, {"x": bad}, rng)
    assert float(m["nonfinite_skipped"]) == 1.0
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_augment_noise_applied_and_dp_identical():
    """train.augment_noise: (a) the jitter is actually applied (loss moves
    vs sigma=0 on the same batch/rng), (b) the fused shard_map step — where
    the noise is pre-drawn at GLOBAL shape (trainer._AUG_TAG) — matches the
    single-device step, and (c) the non-fused pjit step matches too (its
    in-step draw has global semantics under pjit)."""
    cfg0 = tiny_config()
    model = DPF(cfg0)
    tx = make_optimizer(cfg0.train)
    rng = jax.random.PRNGKey(3)
    state = init_state(model, cfg0, rng, tx)
    x = jax.random.normal(jax.random.PRNGKey(4), (16, 64, 3))

    def run(cfg, mesh=None):
        st = jax.tree.map(jnp.copy, state)
        st, m = make_train_step(model, tx, cfg, mesh)(st, {"x": x}, rng)
        return st, float(m["loss"])

    _, l_clean = run(cfg0)
    cfga = tiny_config(train={"augment_noise": 0.1})
    s_single, l_aug = run(cfga)
    assert abs(l_aug - l_clean) > 1e-4, "augment noise not applied"

    mesh = create_mesh()
    require_mesh8(mesh)
    # non-fused pjit path
    s_pjit, l_pjit = run(cfga, mesh)
    np.testing.assert_allclose(l_pjit, l_aug, rtol=1e-5)
    # fused shard_map path (pre-drawn global xnoise)
    cfgf = tiny_config(train={"augment_noise": 0.1, "fused_point_flow": True,
                              "fused_encoder": True})
    s_f1, l_f1 = run(cfgf)
    s_f8, l_f8 = run(cfgf, mesh)
    np.testing.assert_allclose(l_f8, l_f1, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_f1.params), jax.tree.leaves(s_f8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)
