"""Device-resident data path tests (dpfx/data/device.py +
Trainer.fit_resident / make_resident_multi_step): the TPU-native
replacement for host-streamed batching (SURVEY.md §2 C4 redesign)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpfx.config import config_from_dict
from dpfx.data import SyntheticDataset, preload_clouds
from dpfx.data.device import preload_clouds as preload_direct
from dpfx.models import DPF
from dpfx.parallel import create_mesh
from dpfx.train import (
    Trainer,
    init_state,
    make_optimizer,
    make_resident_multi_step,
    make_train_step,
)
from dpfx.train.trainer import _resident_draw
from _helpers import require_mesh8


def tiny_config(**over):
    d = {
        "experiment": "gen",
        "name": "resident_test",
        "model": {
            "dz": 16,
            "point_flow": {"n_layers": 4, "hidden": 32, "n_hidden": 2},
            "latent_flow": {"n_layers": 4, "hidden": 32, "n_hidden": 2},
            "encoder": {"point_widths": [32, 64], "head_widths": [32]},
        },
        "data": {"dataset": "synthetic", "n_points": 64, "synthetic_size": 48,
                 "device_resident": True},
        "train": {
            "batch_size": 16,
            "steps": 12,
            "steps_per_call": 3,
            "lr": 1e-3,
            "log_every": 6,
            "ckpt_every": 1000,
            "eval_every": 1000,
        },
    }
    for k, v in over.items():
        d[k].update(v) if isinstance(v, dict) and k in d else d.update({k: v})
    return config_from_dict(d)


def _data(s=48, p=64, seed=0):
    return np.asarray(
        jax.random.normal(jax.random.PRNGKey(seed), (s, p, 3)), np.float32
    )


def test_resident_matches_host_fed_steps():
    """One resident K-step call == K host-fed make_train_step calls on the
    batches the resident draw selects (same rng base): the on-device gather
    and the out-of-region eps recipe must be bit-equivalent to the in-step
    draw."""
    cfg = tiny_config()
    model = DPF(cfg)
    tx = make_optimizer(cfg.train)
    rng = jax.random.PRNGKey(3)
    s0 = init_state(model, cfg, rng, tx)
    s1 = jax.tree.map(jnp.copy, s0)
    data = _data()
    k, b, n = 3, cfg.train.batch_size, cfg.data.n_points

    ci, pi, eps, _ = _resident_draw(
        rng, s0.step, k, b, data.shape[0], data.shape[1], n, cfg.model.dz,
        draw=cfg.data.resident_draw)
    assert pi.shape == (k, b, 0)  # P == N: no subsample indices
    step = make_train_step(model, tx, cfg, None)
    for t in range(k):
        x = jnp.asarray(data)[ci[t]]
        # NO eps fed: the in-step draw must reproduce the resident stream
        s0, m0 = step(s0, {"x": x}, rng)

    multi = make_resident_multi_step(model, tx, cfg, None, k)
    s1, m1 = multi(s1, jnp.asarray(data), rng)
    assert m1["loss"].shape == (k,)
    np.testing.assert_allclose(float(m1["loss"][-1]), float(m0["loss"]),
                               rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=1e-4,
                                   atol=1e-6)


def test_resident_subsample_without_replacement():
    """P > N: the device-side point subsample is uniform WITHOUT
    replacement (top-N of per-point keys), matching
    dpfx.data.loader.sample_cloud's semantics."""
    cfg = tiny_config(data={"n_points": 32})
    rng = jax.random.PRNGKey(0)
    k, b, p, n = 4, 8, 100, 32
    ci, pi, eps, _ = _resident_draw(rng, jnp.zeros((), jnp.int32), k, b, 24, p,
                                 n, cfg.model.dz)
    pi = np.asarray(pi)
    assert pi.shape == (k, b, n)
    assert pi.min() >= 0 and pi.max() < p
    for t in range(k):
        for row in pi[t]:
            assert len(set(row.tolist())) == n, "duplicate point index"
    ci = np.asarray(ci)
    assert ci.min() >= 0 and ci.max() < 24
    # draws differ per step and are resume-stable (absolute-step keyed)
    ci2, _, _, _ = _resident_draw(rng, jnp.asarray(2, jnp.int32), k, b, 24, p,
                               n, cfg.model.dz)
    np.testing.assert_array_equal(np.asarray(ci2)[0], ci[2])


@pytest.mark.parametrize("fused", [False, True])
def test_resident_sharded_matches_single(fused):
    """Resident multi-step on the 8-device mesh == single device, for both
    the pjit path and the fused shard_map path, including the on-device
    subsample (P != N)."""
    cfg = tiny_config(
        data={"n_points": 32},
        train={"fused_point_flow": fused, "fused_encoder": fused},
    )
    model = DPF(cfg)
    tx = make_optimizer(cfg.train)
    rng = jax.random.PRNGKey(1)
    s0 = init_state(model, cfg, rng, tx)
    s1 = jax.tree.map(jnp.copy, s0)
    data = jnp.asarray(_data(s=40, p=100))

    multi_single = make_resident_multi_step(model, tx, cfg, None, 2)
    mesh = create_mesh()
    require_mesh8(mesh)
    multi_mesh = make_resident_multi_step(model, tx, cfg, mesh, 2)
    s0, m0 = multi_single(s0, data, rng)
    s1, m1 = multi_mesh(s1, data, rng)
    np.testing.assert_allclose(np.asarray(m1["loss"]), np.asarray(m0["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                   atol=1e-6)


def test_fit_resident_cadence_and_tail(tmp_path):
    """fit_resident: steps not a multiple of steps_per_call (12 % 5 -> tail
    of 2), logging windows, final checkpoint, and learning on the
    synthetic mixture."""
    cfg = tiny_config(train={"ckpt_dir": str(tmp_path), "steps": 12,
                             "steps_per_call": 5, "log_every": 5,
                             "ckpt_every": 10})
    trainer = Trainer(cfg)
    ds = SyntheticDataset(size=48, n_stored=128, split="train")
    clouds = preload_clouds(ds)
    assert clouds.shape == (48, 128, 3)
    trainer.fit_resident(clouds)
    assert int(trainer.state.step) == 12
    assert trainer.history, "no logged history"
    assert trainer.ckpt.latest_step() == 12
    # resume continues from 12 with the same resident path
    cfg2 = tiny_config(train={"ckpt_dir": str(tmp_path), "steps": 15,
                              "steps_per_call": 5, "log_every": 5,
                              "ckpt_every": 10})
    t2 = Trainer(cfg2)
    assert t2.maybe_resume() == 12
    t2.fit_resident(clouds)
    assert int(t2.state.step) == 15


def test_fit_resident_learns():
    cfg = tiny_config(train={"steps": 40, "steps_per_call": 8,
                             "log_every": 8, "ckpt_dir": "/tmp/dpfx_res_t"})
    trainer = Trainer(cfg)
    ds = SyntheticDataset(size=48, n_stored=64, split="train")
    trainer.fit_resident(preload_clouds(ds))
    first, last = trainer.history[0], trainer.history[-1]
    assert last["loss"] < first["loss"], f"no learning: {first} -> {last}"


def test_preload_clouds_validates():
    class Ragged:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return np.zeros((10 + i, 3), np.float32)

    with pytest.raises(ValueError, match="uniform cloud shapes"):
        preload_direct(Ragged())

    class Empty:
        def __len__(self):
            return 0

        def __getitem__(self, i):  # pragma: no cover
            raise IndexError

    with pytest.raises(ValueError, match="empty"):
        preload_direct(Empty())


def svr_tiny_config(**over):
    d = {
        "experiment": "svr",
        "name": "resident_svr_test",
        "model": {
            "dz": 16,
            "point_flow": {"n_layers": 4, "hidden": 32, "n_hidden": 2},
            "latent_flow": {"n_layers": 4, "hidden": 32, "n_hidden": 2},
            "encoder": {"point_widths": [32, 64], "head_widths": [32]},
            # mixer (pure matmul): bit-deterministic across program shapes.
            # XLA-CPU conv autodiff differs by ulps between the scan and
            # standalone programs, which early Adam amplifies to ~1e-3 —
            # measured: per-step LOSSES identical, params drift; the conv
            # path is covered by test_fit_resident_svr_learns and the CLI
            # SVR smoke.
            "image_encoder": {"arch": "mixer", "patch": 8, "width": 32,
                              "depth": 2, "image_size": 16},
        },
        "data": {"dataset": "synthetic_svr", "n_points": 64,
                 "synthetic_size": 32, "device_resident": True},
        "train": {
            "batch_size": 16,
            "steps": 9,
            "steps_per_call": 3,
            "lr": 1e-3,
            "log_every": 3,
            "ckpt_every": 1000,
            "eval_every": 1000,
        },
    }
    for k, v in over.items():
        d[k].update(v) if isinstance(v, dict) and k in d else d.update({k: v})
    return config_from_dict(d)


def _images(s=48, hw=16, seed=7):
    return np.asarray(
        jax.random.uniform(jax.random.PRNGKey(seed), (s, hw, hw, 3)),
        np.float32,
    )


def test_resident_svr_matches_host_fed_steps():
    """SVR resident K-step call == K host-fed steps on the (cloud, image)
    pairs the resident draw selects: the on-device image gather must feed
    the SAME paired render the host loader would."""
    cfg = svr_tiny_config()
    model = DPF(cfg)
    tx = make_optimizer(cfg.train)
    rng = jax.random.PRNGKey(3)
    s0 = init_state(model, cfg, rng, tx)
    s1 = jax.tree.map(jnp.copy, s0)
    data, images = _data(s=32), _images(s=32)
    k, b, n = 3, cfg.train.batch_size, cfg.data.n_points

    ci, pi, eps, _ = _resident_draw(
        rng, s0.step, k, b, data.shape[0], data.shape[1], n, cfg.model.dz,
        draw=cfg.data.resident_draw)
    step = make_train_step(model, tx, cfg, None)
    for t in range(k):
        x = jnp.asarray(data)[ci[t]]
        img = jnp.asarray(images)[ci[t]]
        s0, m0 = step(s0, {"x": x, "image": img}, rng)

    multi = make_resident_multi_step(model, tx, cfg, None, k, with_images=True)
    s1, m1 = multi(s1, jnp.asarray(data), jnp.asarray(images), rng)
    assert m1["loss"].shape == (k,)
    np.testing.assert_allclose(float(m1["loss"][-1]), float(m0["loss"]),
                               rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=1e-4,
                                   atol=1e-6)


@pytest.mark.parametrize("fused", [False, True])
def test_resident_svr_sharded_matches_single(fused):
    """SVR resident multi-step on the 8-device mesh == single device, for
    the pjit path and the fused(point-flow) shard_map path — the image
    stack rides replicated and gathers shard with the batch."""
    cfg = svr_tiny_config(
        data={"n_points": 32},
        train={"fused_point_flow": fused},
    )
    model = DPF(cfg)
    tx = make_optimizer(cfg.train)
    rng = jax.random.PRNGKey(1)
    s0 = init_state(model, cfg, rng, tx)
    s1 = jax.tree.map(jnp.copy, s0)
    data = jnp.asarray(_data(s=40, p=100))
    images = jnp.asarray(_images(s=40))

    multi_single = make_resident_multi_step(model, tx, cfg, None, 2,
                                            with_images=True)
    mesh = create_mesh()
    require_mesh8(mesh)
    multi_mesh = make_resident_multi_step(model, tx, cfg, mesh, 2,
                                          with_images=True)
    s0, m0 = multi_single(s0, data, images, rng)
    s1, m1 = multi_mesh(s1, data, images, rng)
    np.testing.assert_allclose(np.asarray(m1["loss"]), np.asarray(m0["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                   atol=1e-6)


def test_fit_resident_svr_learns(tmp_path):
    """End-to-end resident SVR: preload (clouds, renders) from the paired
    synthetic dataset, train through fit_resident, learn, checkpoint."""
    from dpfx.data import preload_images
    from dpfx.data.svr import SyntheticSVRDataset

    cfg = svr_tiny_config(
        # the conv (reference-style) backbone rides the resident path here
        model={"image_encoder": {"arch": "conv", "widths": [8, 16],
                                 "blocks_per_stage": 1, "image_size": 16}},
        train={"steps": 30, "steps_per_call": 6,
               "log_every": 6, "ckpt_every": 30,
               "ckpt_dir": str(tmp_path)})
    trainer = Trainer(cfg)
    ds = SyntheticSVRDataset(size=32, n_stored=64, image_size=16)
    clouds, images = preload_clouds(ds), preload_images(ds)
    assert clouds.shape == (32, 64, 3)
    assert images.shape == (32, 16, 16, 3)
    trainer.fit_resident(clouds, images=images)
    assert int(trainer.state.step) == 30
    assert trainer.ckpt.latest_step() == 30
    first, last = trainer.history[0], trainer.history[-1]
    assert last["loss"] < first["loss"], f"no learning: {first} -> {last}"


def test_preload_images_validates():
    class RaggedImages:
        def __len__(self):
            return 2

        def __getitem__(self, i):  # pragma: no cover
            return np.zeros((8, 3), np.float32)

        def image(self, i):
            return np.zeros((8 + i, 8, 3), np.float32)

    from dpfx.data import preload_images

    with pytest.raises(ValueError, match="uniform image shapes"):
        preload_images(RaggedImages())


def test_resident_stored_smaller_than_n_points():
    """Stored clouds smaller than data.n_points: the resident draw falls
    back to with-replacement indices (== loader.sample_cloud's m < n_points
    fallback) instead of crashing in top_k."""
    ci, pi, eps, _ = _resident_draw(
        jax.random.PRNGKey(0), jnp.int32(5), 3, 8, s=48, p=32, n=64, dz=16
    )
    assert pi.shape == (3, 8, 64)
    assert int(pi.min()) >= 0 and int(pi.max()) < 32

    cfg = tiny_config(train={"steps": 6, "steps_per_call": 3,
                             "ckpt_dir": "/tmp/dpfx_res_small"})
    trainer = Trainer(cfg)
    trainer.fit_resident(_data(s=48, p=32))  # P=32 < n_points=64
    assert np.isfinite(trainer.history[-1]["loss"])


@pytest.mark.parametrize("fused", [False, True])
def test_resident_data_sharded_matches_single(fused):
    """parallel.resident_sharding=sharded: the cloud stack sharded over the
    mesh (S/D rows per device, psum-gathered batches) must produce updates
    BIT-equivalent to the single-device resident path — same global
    index/noise streams, exact gather. Covers padding (S=40 not divisible
    by 8) and the on-device point subsample (P=100 != N)."""
    from dpfx.parallel import shard_resident_stack

    cfg = tiny_config(
        data={"n_points": 32},
        train={"fused_point_flow": fused, "fused_encoder": fused},
    )
    model = DPF(cfg)
    tx = make_optimizer(cfg.train)
    rng = jax.random.PRNGKey(1)
    s0 = init_state(model, cfg, rng, tx)
    s1 = jax.tree.map(jnp.copy, s0)
    data = _data(s=40, p=100)

    multi_single = make_resident_multi_step(model, tx, cfg, None, 2)
    mesh = create_mesh()
    require_mesh8(mesh)
    data_g = shard_resident_stack(data, mesh)
    assert data_g.shape[0] == 40  # padded to a device multiple
    multi_sharded = make_resident_multi_step(
        model, tx, cfg, mesh, 2, data_sharded=True, logical_rows=40)
    s0, m0 = multi_single(s0, jnp.asarray(data), rng)
    s1, m1 = multi_sharded(s1, data_g, rng)
    np.testing.assert_allclose(np.asarray(m1["loss"]), np.asarray(m0["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                   atol=1e-6)


def test_resident_data_sharded_padding():
    """S=42 pads to 48 on the 8-device mesh; padded rows are never drawn
    (the draw indexes [0, S)), so results still match single-device."""
    from dpfx.parallel import shard_resident_stack
    from dpfx.parallel.distributed import padded_rows

    assert padded_rows(42, 8) == 48
    cfg = tiny_config(data={"n_points": 64})
    model = DPF(cfg)
    tx = make_optimizer(cfg.train)
    rng = jax.random.PRNGKey(7)
    s0 = init_state(model, cfg, rng, tx)
    s1 = jax.tree.map(jnp.copy, s0)
    data = _data(s=42, p=64, seed=2)
    mesh = create_mesh()
    require_mesh8(mesh)
    data_g = shard_resident_stack(data, mesh)
    assert data_g.shape[0] == 48
    multi_single = make_resident_multi_step(model, tx, cfg, None, 2)
    multi_sharded = make_resident_multi_step(
        model, tx, cfg, mesh, 2, data_sharded=True, logical_rows=42)
    s0, m0 = multi_single(s0, jnp.asarray(data), rng)
    s1, m1 = multi_sharded(s1, data_g, rng)
    np.testing.assert_allclose(np.asarray(m1["loss"]), np.asarray(m0["loss"]),
                               rtol=1e-5)


def test_resident_data_sharded_svr_images():
    """SVR paired stacks: the render stack shards on the same cloud axis
    and the psum-gathered (cloud, image) pairing matches the replicated
    path exactly."""
    from dpfx.parallel import shard_resident_stack

    cfg = tiny_config(
        experiment="svr",
        data={"dataset": "synthetic_svr", "n_points": 64},
        model={"image_encoder": {"arch": "mixer", "image_size": 16,
                                 "patch": 8, "dim": 32, "depth": 1}},
    )
    model = DPF(cfg)
    tx = make_optimizer(cfg.train)
    rng = jax.random.PRNGKey(5)
    s0 = init_state(model, cfg, rng, tx)
    s1 = jax.tree.map(jnp.copy, s0)
    data = _data(s=24, p=64, seed=3)
    imgs = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(9), (24, 16, 16, 3)),
        np.float32)
    mesh = create_mesh()
    require_mesh8(mesh)
    multi_single = make_resident_multi_step(model, tx, cfg, None, 2,
                                            with_images=True)
    multi_sharded = make_resident_multi_step(
        model, tx, cfg, mesh, 2, with_images=True, data_sharded=True,
        logical_rows=24)
    s0, m0 = multi_single(s0, jnp.asarray(data), jnp.asarray(imgs), rng)
    s1, m1 = multi_sharded(
        s1, shard_resident_stack(data, mesh), shard_resident_stack(imgs, mesh),
        rng)
    np.testing.assert_allclose(np.asarray(m1["loss"]), np.asarray(m0["loss"]),
                               rtol=1e-5)
    # params: the pmean's 8-way reduction order differs from the
    # single-device batch sum, and Adam's 1/(sqrt(v)+eps) at near-zero
    # image-encoder moments amplifies that fp noise to ~0.4% relative
    # after 2 steps — the losses above pin the gather itself
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=6e-3,
                                   atol=1e-6)


def test_fit_resident_sharded_via_config(tmp_path):
    """Trainer.fit_resident with parallel.resident_sharding=sharded runs
    end-to-end on the mesh and matches the replicated config's losses."""
    over = {"train": {"ckpt_dir": str(tmp_path / "a"), "steps": 6,
                      "steps_per_call": 3}}
    cfg_r = tiny_config(**over)
    tr_r = Trainer(cfg_r, log_fn=lambda *a, **k: None)
    require_mesh8(tr_r.mesh)
    cfg_s = tiny_config(
        parallel={"resident_sharding": "sharded"},
        train={"ckpt_dir": str(tmp_path / "b"), "steps": 6,
               "steps_per_call": 3})
    tr_s = Trainer(cfg_s, log_fn=lambda *a, **k: None)
    ds = SyntheticDataset(size=48, n_stored=64, split="train")
    clouds = preload_clouds(ds)
    tr_r.fit_resident(clouds)
    tr_s.fit_resident(clouds)
    assert int(tr_s.state.step) == 6
    np.testing.assert_allclose(
        [h["loss"] for h in tr_s.history],
        [h["loss"] for h in tr_r.history], rtol=1e-5)


def test_resident_epoch_draw_is_permutation_walk():
    """data.resident_draw=epoch: the on-device draw walks a fresh
    permutation per epoch in batches of B (host-loader / reference epoch
    semantics — SURVEY.md §3.1) and is resume-stable (absolute-step keyed)."""
    rng = jax.random.PRNGKey(9)
    s, b, k = 24, 8, 6  # bpe = 3 -> k=6 covers exactly 2 epochs
    ci, _, _, _ = _resident_draw(rng, jnp.zeros((), jnp.int32), k, b, s, 64, 64,
                              16, draw="epoch")
    ci = np.asarray(ci)
    epoch0 = ci[:3].reshape(-1)
    epoch1 = ci[3:].reshape(-1)
    assert sorted(epoch0.tolist()) == list(range(s))
    assert sorted(epoch1.tolist()) == list(range(s))
    assert not np.array_equal(epoch0, epoch1)  # reshuffled between epochs
    # resume-stable: drawing from step 2 reproduces step 2's batch
    ci2, _, _, _ = _resident_draw(rng, jnp.asarray(2, jnp.int32), k, b, s, 64,
                               64, 16, draw="epoch")
    np.testing.assert_array_equal(np.asarray(ci2)[0], ci[2])


def test_fit_resident_epoch_mode_end_to_end(tmp_path):
    cfg = tiny_config(
        data={"dataset": "synthetic", "n_points": 64, "synthetic_size": 48,
              "device_resident": True, "resident_draw": "epoch"},
        train={"ckpt_dir": str(tmp_path), "steps": 6, "steps_per_call": 3})
    tr = Trainer(cfg, log_fn=lambda *a, **k: None)
    ds = SyntheticDataset(size=48, n_stored=64, split="train")
    tr.fit_resident(preload_clouds(ds))
    assert int(tr.state.step) == 6
    assert all(np.isfinite(h["loss"]) for h in tr.history)


@pytest.mark.parametrize("path", ["fused", "data_sharded"])
def test_resident_augment_sharded_matches_single(path):
    """train.augment_noise on the resident shard_map paths: the jitter is
    pre-drawn at GLOBAL shape by _resident_draw (xnoise=True) so the
    sharded update matches the single-device resident update exactly."""
    from dpfx.parallel import shard_resident_stack

    tr = {"augment_noise": 0.05}
    if path == "fused":
        tr.update({"fused_point_flow": True, "fused_encoder": True})
    cfg = tiny_config(data={"n_points": 32}, train=tr)
    model = DPF(cfg)
    tx = make_optimizer(cfg.train)
    rng = jax.random.PRNGKey(11)
    s0 = init_state(model, cfg, rng, tx)
    s1 = jax.tree.map(jnp.copy, s0)
    data = _data(s=40, p=100)

    multi_single = make_resident_multi_step(model, tx, cfg, None, 2)
    mesh = create_mesh()
    require_mesh8(mesh)
    if path == "data_sharded":
        data_dev = shard_resident_stack(data, mesh)
        multi_mesh = make_resident_multi_step(
            model, tx, cfg, mesh, 2, data_sharded=True, logical_rows=40)
    else:
        data_dev = jnp.asarray(data)
        multi_mesh = make_resident_multi_step(model, tx, cfg, mesh, 2)
    s0, m0 = multi_single(s0, jnp.asarray(data), rng)
    s1, m1 = multi_mesh(s1, data_dev, rng)
    np.testing.assert_allclose(np.asarray(m1["loss"]), np.asarray(m0["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                   atol=1e-6)


def test_resident_augment_matches_host_fed():
    """With augment_noise, a resident step still equals the host-fed step
    on the same batch (the in-step fallback and the resident path share
    the fold_in(step-rng, _AUG_TAG) recipe)."""
    cfg = tiny_config(train={"augment_noise": 0.07})
    model = DPF(cfg)
    tx = make_optimizer(cfg.train)
    rng = jax.random.PRNGKey(5)
    s0 = init_state(model, cfg, rng, tx)
    s1 = jax.tree.map(jnp.copy, s0)
    data = _data(s=48, p=64)

    ci, pi, eps, _ = _resident_draw(
        rng, jnp.zeros((), jnp.int32), 2, cfg.train.batch_size, 48, 64, 64,
        cfg.model.dz, draw=cfg.data.resident_draw)
    step = make_train_step(model, tx, cfg, None)
    for t in range(2):
        s0, m0 = step(s0, {"x": jnp.take(jnp.asarray(data),
                                         ci[t], axis=0)}, rng)
    multi = make_resident_multi_step(model, tx, cfg, None, 2)
    s1, m1 = multi(s1, jnp.asarray(data), rng)
    np.testing.assert_allclose(float(m1["loss"][-1]), float(m0["loss"]),
                               rtol=1e-5)
