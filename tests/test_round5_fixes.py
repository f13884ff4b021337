"""Round-5 fixes: per-slot subsample rng (pod == single for any stored
size), batch_shard ragged guards, idempotent distributed init, and the
EMD exact-cache VMEM fallback (round-4 ADVICE items + VERDICT item 3)."""

import numpy as np
import pytest

from dpfx.data import SyntheticDataset, iterate_batches


def _collect(ds, batch_shard=None, n_batches=3, seed=5):
    out = []
    it = iterate_batches(ds, 8, 48, seed=seed, batch_shard=batch_shard)
    for _ in range(n_batches):
        out.append(next(it))
    return out


def test_batch_shard_bit_identical_with_oversized_storage():
    """stored (96) > n_points (48) — the real ShapeNet shape: each global
    batch assembled from two per-host shards must equal the single-process
    batch BIT-for-bit, including the per-item point subsample (the
    per-slot rng; a shared stream consumed in local order diverges here)."""
    ds = SyntheticDataset(size=32, n_stored=96, split="train")
    single = _collect(ds)
    lo = _collect(ds, batch_shard=(0, 4))
    hi = _collect(ds, batch_shard=(4, 8))
    for s, a, b in zip(single, lo, hi):
        assembled = np.concatenate([a["x"], b["x"]], axis=0)
        np.testing.assert_array_equal(s["x"], assembled)


def test_batch_shard_requires_drop_last():
    ds = SyntheticDataset(size=32, n_stored=48, split="train")
    with pytest.raises(ValueError, match="drop_last"):
        next(iterate_batches(ds, 8, 48, batch_shard=(0, 4), drop_last=False))


def test_batch_shard_empty_slice_raises():
    """A process whose slice of the batch is empty must fail loudly, not
    silently desynchronize the pod (round-4 ADVICE #2)."""
    ds = SyntheticDataset(size=32, n_stored=48, split="train")
    with pytest.raises(RuntimeError, match="empty"):
        next(iterate_batches(ds, 4, 48, batch_shard=(6, 8)))


def test_subsample_varies_across_epochs_and_slots():
    """The per-slot rng must not collapse the stream: different epochs and
    different slots draw different subsamples of the same item."""
    ds = SyntheticDataset(size=2, n_stored=96, split="train")
    it = iterate_batches(ds, 2, 48, seed=0, shuffle=False, epochs=2)
    e0, e1 = next(it), next(it)
    assert not np.array_equal(e0["x"], e1["x"])  # epoch changes the draw
    # same item in both rows (size-2 dataset, batch 2, no shuffle): slots
    # differ so the two rows' subsamples of item 0/1 differ across epochs
    assert not np.array_equal(e0["x"][0], e1["x"][0])


def test_initialize_distributed_idempotent(monkeypatch):
    """jax 0.9's double-init RuntimeError says 'should only be called
    once' — initialize_distributed must treat both that and a live client
    as already-initialized instead of crashing (round-4 ADVICE #1)."""
    import dpfx.parallel.distributed as dist

    calls = []

    def fake_init(**kw):
        calls.append(kw)
        raise RuntimeError("distributed.initialize should only be called once.")

    monkeypatch.setattr(dist.jax.distributed, "initialize", fake_init)
    monkeypatch.setattr(dist, "_already_initialized", lambda: False)
    dist.initialize_distributed("localhost:1234", 1, 0)  # must not raise
    assert len(calls) == 1

    # live client short-circuits before calling initialize at all
    monkeypatch.setattr(dist, "_already_initialized", lambda: True)
    dist.initialize_distributed("localhost:1234", 1, 0)
    assert len(calls) == 1


def test_emd_exact_cache_vmem_fallback():
    """The exact-mode f32 d+ss caches cost 2*Np*Mp*4 bytes of VMEM scratch;
    beyond the scoped budget the kernel cannot compile, so the pairwise
    path must auto-disable the cache (round-4 ADVICE #3). Checked in
    interpret mode via the kernel's scratch count (cache on -> 2 extra
    f32 scratches)."""
    import importlib

    emd_mod = importlib.import_module("dpfx.ops.emd")

    n_pad = m_pad = 4096
    budget = emd_mod.EMD_EXACT_VMEM_MB * 1024 * 1024
    assert 2 * n_pad * m_pad * 4 > budget  # 134 MB > default 56 MB

    # decision logic, extracted exactly as the kernel computes it
    def decide(np_, mp_):
        return (emd_mod.EMD_EXACT_CACHE
                and 2 * np_ * mp_ * 4 <= budget)

    assert decide(2048, 2048) is True     # flagship shape keeps the cache
    assert decide(4096, 4096) is False    # over-budget shape falls back

    # and the over-budget pairwise call still works (interpret mode,
    # tiny real points padded virtually): run the real entry point at a
    # shape whose padded caches exceed a temporarily tiny budget
    old = emd_mod.EMD_EXACT_VMEM_MB
    emd_mod.EMD_EXACT_VMEM_MB = 0  # force the fallback branch for any shape
    try:
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 64, 3)).astype(np.float32)
        y = rng.normal(size=(3, 64, 3)).astype(np.float32)
        d = emd_mod.emd_pairwise(x, y, impl="jnp")  # oracle
        dp = emd_mod.emd_pairwise(x, y, impl="pallas", precision="exact")
        np.testing.assert_allclose(np.asarray(dp), np.asarray(d), rtol=2e-2,
                                   atol=2e-2)
    finally:
        emd_mod.EMD_EXACT_VMEM_MB = old


def test_gen_metrics_emit_both_jsd_frames():
    """Every gen-eval output must carry BOTH jsd frames plus which one the
    headline "jsd" is (VERIFY #20 hedge: whether the reference
    re-normalizes before JSD is unverifiable offline, so published tables
    self-describe), and per-category tables must ship their convention
    note (VERIFY #21)."""
    import warnings

    import numpy as np

    from dpfx.metrics.generation import compute_all_metrics

    rng = np.random.default_rng(0)
    gen = rng.normal(size=(6, 32, 3)).astype(np.float32)
    ref = rng.normal(size=(6, 32, 3)).astype(np.float32)
    labels = np.array([0, 0, 0, 1, 1, 1])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = compute_all_metrics(gen, ref, metrics=["cd"],
                                  ref_labels=labels,
                                  label_names={0: "a", 1: "b"})
    assert out["jsd_frame"] == "fit"
    assert out["jsd"] == out["jsd_fit"]
    assert np.isfinite(out["jsd_raw"]) and out["jsd_raw"] != out["jsd_fit"]
    assert "per_category" in out and "cov_c" in out["per_category_convention"]

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out_raw = compute_all_metrics(gen, ref, metrics=["cd"],
                                      jsd_frame="raw")
    assert out_raw["jsd"] == out_raw["jsd_raw"]
    # frames agree between invocations (deterministic hedge)
    assert out_raw["jsd_fit"] == out["jsd_fit"]


def test_ckpt_keep_retention(tmp_path):
    """train.ckpt_keep controls orbax retention; 0 keeps every checkpoint
    (long-horizon quality runs eval non-final steps post-hoc)."""
    import jax

    from dpfx.config import config_from_dict
    from dpfx.data import SyntheticDataset, preload_clouds
    from dpfx.train import Trainer

    def run(keep, d):
        cfg = config_from_dict({
            "experiment": "gen", "name": "keep",
            "model": {"dz": 8,
                      "point_flow": {"n_layers": 2, "hidden": 16, "n_hidden": 1},
                      "latent_flow": {"n_layers": 2, "hidden": 16, "n_hidden": 1},
                      "encoder": {"point_widths": [16, 32], "head_widths": [16]}},
            "data": {"dataset": "synthetic", "n_points": 32,
                     "synthetic_size": 16, "device_resident": True},
            "train": {"batch_size": 8, "steps": 6, "steps_per_call": 2,
                      "lr": 1e-3, "log_every": 100, "ckpt_every": 2,
                      "eval_every": 1000, "ckpt_dir": str(d),
                      "ckpt_keep": keep},
        })
        tr = Trainer(cfg, log_fn=lambda *a, **k: None)
        tr.fit_resident(preload_clouds(SyntheticDataset(size=16, n_stored=32,
                                                        split="train")))
        return sorted(int(s) for s in tr.ckpt.manager.all_steps())

    assert run(0, tmp_path / "all") == [2, 4, 6]   # keep everything
    assert run(1, tmp_path / "one") == [6]         # latest only


def test_quantize_flow_params_error_bounded():
    """int8 weight quantization (the serving-chain A/B surface,
    tools/bench_sample_int8.py): dequantized stacks must sit within the
    symmetric-quant bound (half a quant step) of the originals, and the
    inverse flow through dequantized weights must track the f32 flow."""
    import jax
    import jax.numpy as jnp

    from dpfx.config import config_from_dict
    from dpfx.models import DPF
    from dpfx.ops.fused_sampler import (
        fused_point_flow_inverse, quantize_flow_params,
        stack_point_flow_params,
    )

    cfg = config_from_dict({
        "experiment": "gen", "name": "q",
        "model": {"dz": 16,
                  "point_flow": {"n_layers": 4, "hidden": 32, "n_hidden": 2,
                                 "scale_cap": 3.0},
                  "latent_flow": {"n_layers": 2, "hidden": 16, "n_hidden": 1},
                  "encoder": {"point_widths": [16, 32], "head_widths": [16]}},
    })
    model = DPF(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((2, 16, 3), jnp.float32), rng)
    sp = stack_point_flow_params(params, 3.0)
    qp = quantize_flow_params(sp)

    for wq, w, srow in ((qp.sp.wx, sp.wx, 0), (qp.sp.wh, sp.wh, 1),
                        (qp.sp.wout, sp.wout, 2)):
        if w.size == 0:
            continue
        s = qp.scales[:, srow]
        deq = wq.astype(jnp.float32) * s.reshape((-1,) + (1,) * (w.ndim - 1))
        err = jnp.max(jnp.abs(deq - w))
        assert float(err) <= float(jnp.max(s)) * 0.5 + 1e-7

    # end-to-end: inverse flow with host-dequantized weights stays close
    deq_sp = sp._replace(
        wx=qp.sp.wx.astype(jnp.float32) * qp.scales[:, 0][:, None, None],
        wh=(qp.sp.wh.astype(jnp.float32)
            * qp.scales[:, 1][:, None, None, None]),
        wout=qp.sp.wout.astype(jnp.float32) * qp.scales[:, 2][:, None, None],
    )
    u = jax.random.normal(jax.random.fold_in(rng, 1), (2, 64, 3))
    z = jax.random.normal(jax.random.fold_in(rng, 2), (2, 16))
    x = fused_point_flow_inverse(sp, u, z, tile=128, dtype=jnp.float32)
    xq = fused_point_flow_inverse(deq_sp, u, z, tile=128, dtype=jnp.float32)
    rel = float(jnp.sqrt(jnp.mean((x - xq) ** 2))
                / jnp.sqrt(jnp.mean(x ** 2)))
    assert rel < 0.05, rel


def test_augment_noise_anneal_schedule():
    """train.augment_noise_anneal_steps: sigma(step) interpolates
    augment_noise -> augment_noise_final linearly, then holds. Pins
    (a) step 0 of an annealed run bit-equals the constant-sigma step,
    (b) once annealed to final=0 the update bit-equals the augment-OFF
    step (the jitter stream multiplies by exactly 0 and the eps stream is
    untouched), (c) single-device == 8-device DP on the fused shard_map
    path (sigma is a function of the replicated step counter only)."""
    import jax
    import jax.numpy as jnp
    from dpfx.models import DPF
    from dpfx.parallel import create_mesh
    from dpfx.train import init_state, make_optimizer, make_train_step
    from dpfx.train.trainer import _aug_sigma
    from _helpers import require_mesh8

    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_train import tiny_config

    # schedule math (traced form evaluated eagerly)
    tc = tiny_config(train={"augment_noise": 0.2, "augment_noise_final": 0.05,
                            "augment_noise_anneal_steps": 10}).train
    s = [float(_aug_sigma(tc, jnp.asarray(i, jnp.int32))) for i in (0, 5, 10, 20)]
    np.testing.assert_allclose(s, [0.2, 0.125, 0.05, 0.05], rtol=1e-6)

    cfg0 = tiny_config()
    model = DPF(cfg0)
    tx = make_optimizer(cfg0.train)
    rng = jax.random.PRNGKey(3)
    state0 = init_state(model, cfg0, rng, tx)
    x = jax.random.normal(jax.random.PRNGKey(4), (16, 64, 3))

    def step_with(cfg, state, mesh=None):
        st = jax.tree.map(jnp.copy, state)
        st, m = make_train_step(model, tx, cfg, mesh)(st, {"x": x}, rng)
        return st, float(m["loss"])

    # (a) at step 0 anneal start == constant sigma
    cfg_const = tiny_config(train={"augment_noise": 0.1})
    cfg_ann = tiny_config(train={"augment_noise": 0.1,
                                 "augment_noise_final": 0.0,
                                 "augment_noise_anneal_steps": 4})
    _, l_const = step_with(cfg_const, state0)
    _, l_ann0 = step_with(cfg_ann, state0)
    np.testing.assert_allclose(l_ann0, l_const, rtol=1e-6)

    # (b) past the anneal horizon with final=0: bit-equals augment-off
    late = state0.replace(step=jnp.asarray(7, jnp.int32))
    s_off, l_off = step_with(cfg0, late)
    s_ann, l_ann = step_with(cfg_ann, late)
    np.testing.assert_allclose(l_ann, l_off, rtol=0, atol=0)
    for a, b in zip(jax.tree.leaves(s_off.params), jax.tree.leaves(s_ann.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # (c) DP identity mid-anneal on the fused shard_map path
    mesh = create_mesh()
    require_mesh8(mesh)
    cfg_f = tiny_config(train={"augment_noise": 0.1,
                               "augment_noise_final": 0.02,
                               "augment_noise_anneal_steps": 8,
                               "fused_point_flow": True,
                               "fused_encoder": True})
    mid = state0.replace(step=jnp.asarray(3, jnp.int32))
    s1, l1 = step_with(cfg_f, mid)
    s8, l8 = step_with(cfg_f, mid, mesh)
    np.testing.assert_allclose(l8, l1, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)
