"""Checkpoint-compat tests (SURVEY.md §2 C12, §6 fallback protocol):
torch mirror -> .pt -> converter -> JAX model reproduces the mirror's
outputs. This proves the import machinery end-to-end without the
reference mount."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dpfx.compat import convert_state_dict, load_torch_checkpoint, verify_against_template
from dpfx.compat.torch_mirror import DPFMirror
from dpfx.models import DPF
from tests.test_models import tiny_config


@pytest.fixture(scope="module")
def converted():
    cfg = tiny_config()
    mirror = DPFMirror(cfg)
    mirror.randomize_(seed=3)
    params = convert_state_dict(mirror.state_dict())
    model = DPF(cfg)
    rng = jax.random.PRNGKey(0)
    template = model.init(rng, jnp.zeros((2, 16, 3)), rng)
    return cfg, mirror, model, params, template


def test_converted_tree_matches_template(converted):
    _, _, _, params, template = converted
    assert verify_against_template(params, template) == []


def test_point_flow_logprob_parity(converted):
    cfg, mirror, model, params, _ = converted
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 3)).astype(np.float32)
    z = rng.normal(size=(2, cfg.model.dz)).astype(np.float32)

    with torch.no_grad():
        lp_t = mirror.point_flow.log_prob(torch.from_numpy(x), torch.from_numpy(z)).numpy()
    lp_j = np.asarray(
        model.apply(
            params, jnp.asarray(x), jnp.asarray(z),
            method=lambda m, a, b: m.point_flow.log_prob(a, b),
        )
    )
    np.testing.assert_allclose(lp_j, lp_t, rtol=1e-4, atol=1e-4)


def test_inverse_flow_parity(converted):
    cfg, mirror, model, params, _ = converted
    rng = np.random.default_rng(1)
    u = rng.normal(size=(2, 16, 3)).astype(np.float32)
    z = rng.normal(size=(2, cfg.model.dz)).astype(np.float32)

    with torch.no_grad():
        x_t, _ = mirror.point_flow.inverse_(torch.from_numpy(u), torch.from_numpy(z))
    x_j = np.asarray(
        model.apply(
            params, jnp.asarray(u), jnp.asarray(z),
            method=lambda m, a, b: m.point_flow.inverse(a, b),
        )[0]
    )
    np.testing.assert_allclose(x_j, np.asarray(x_t), rtol=1e-4, atol=1e-5)


def test_encoder_parity(converted):
    cfg, mirror, model, params, _ = converted
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 32, 3)).astype(np.float32)
    with torch.no_grad():
        mu_t, lv_t = mirror.encoder(torch.from_numpy(x))
    mu_j, lv_j = model.apply(
        params, jnp.asarray(x), method=lambda m, a: m.encoder(a)
    )
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv_j), lv_t.numpy(), rtol=1e-4, atol=1e-5)


def test_pt_file_roundtrip(tmp_path, converted):
    """Full path: torch.save -> load_torch_checkpoint (with unwrapping and
    config verification) -> latent flow log_prob parity."""
    cfg, mirror, model, _, _ = converted
    pt = tmp_path / "ref_style.pt"
    torch.save({"state_dict": mirror.state_dict(), "epoch": 7}, pt)
    params = load_torch_checkpoint(str(pt), cfg)

    rng = np.random.default_rng(3)
    z = rng.normal(size=(4, cfg.model.dz)).astype(np.float32)
    with torch.no_grad():
        lp_t = mirror.latent_flow.log_prob(torch.from_numpy(z)).numpy()
    lp_j = np.asarray(
        model.apply(params, jnp.asarray(z), method=lambda m, a: m.latent_flow.log_prob(a))
    )
    np.testing.assert_allclose(lp_j, lp_t, rtol=1e-4, atol=1e-4)


def _svr_config(arch: str):
    cfg = tiny_config(experiment="svr")
    cfg.model.image_encoder.arch = arch
    cfg.model.image_encoder.image_size = 32
    cfg.model.image_encoder.patch = 8
    cfg.model.image_encoder.width = 32
    cfg.model.image_encoder.depth = 2
    return cfg


@pytest.mark.parametrize("arch", ["conv", "mixer"])
def test_svr_image_encoder_parity(arch):
    """SVR checkpoints (VERDICT r2 Missing #5): the image encoder converts
    and reproduces the torch mirror's (mu, logvar) to float tolerance."""
    cfg = _svr_config(arch)
    mirror = DPFMirror(cfg)
    mirror.randomize_(seed=11)
    params = convert_state_dict(mirror.state_dict())
    model = DPF(cfg)
    rng = jax.random.PRNGKey(0)
    s = cfg.model.image_encoder.image_size
    template = model.init(
        rng, jnp.zeros((2, 16, 3)), rng, jnp.zeros((2, s, s, 3)),
        method=lambda m, x, r, im: (m.elbo_terms(x, r, im), m.encoder(x)),
    )
    assert verify_against_template(params, template) == []

    img = np.random.default_rng(4).normal(size=(2, s, s, 3)).astype(np.float32)
    with torch.no_grad():
        mu_t, lv_t = mirror.image_encoder(torch.from_numpy(img))
    mu_j, lv_j = model.apply(
        params, jnp.asarray(img), method=lambda m, a: m.image_encoder(a)
    )
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lv_j), lv_t.numpy(), rtol=1e-3, atol=1e-4)


def test_svr_pt_to_orbax_to_eval_roundtrip(tmp_path):
    """End-to-end SVR path (SURVEY.md §9.8): torch.save an SVR mirror ->
    load_torch_checkpoint (strict, config-verified) -> save_as_orbax ->
    restore -> run the SVR posterior + decode on the restored params."""
    cfg = _svr_config("conv")
    mirror = DPFMirror(cfg)
    mirror.randomize_(seed=12)
    pt = tmp_path / "svr_ref.pt"
    torch.save({"model": mirror.state_dict()}, pt)

    params = load_torch_checkpoint(str(pt), cfg)  # strict + template-verified
    out_dir = tmp_path / "orbax"
    from dpfx.compat import save_as_orbax
    from dpfx.train.trainer import CheckpointManager

    save_as_orbax(params, str(out_dir), step=0)
    # the converted checkpoint must be readable through the SAME path the
    # eval/generate CLIs use (restore_for_eval -> restore_params)
    restored = CheckpointManager(str(out_dir)).restore_params(None, step=0)

    model = DPF(cfg)
    s = cfg.model.image_encoder.image_size
    img = np.random.default_rng(5).normal(size=(2, s, s, 3)).astype(np.float32)
    with torch.no_grad():
        mu_t, _ = mirror.image_encoder(torch.from_numpy(img))
    mu_j, _ = model.apply(
        restored, jnp.asarray(img), method=lambda m, a: m.image_encoder(a)
    )
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), rtol=1e-3, atol=1e-4)
    # decode through the converted point flow off the image posterior
    clouds = model.apply(
        restored, jnp.asarray(mu_j), jax.random.PRNGKey(0), 64,
        method=lambda m, z, r, n: m.decode(z, r, n),
    )
    assert clouds.shape == (2, 64, 3) and bool(jnp.all(jnp.isfinite(clouds)))


def test_rules_file_equivalent_to_defaults(tmp_path):
    """The shipped configs/convert_rules_example.yaml reproduces
    DEFAULT_RULES exactly on a full SVR state_dict."""
    from dpfx.compat import load_rules_file

    rules = load_rules_file("configs/convert_rules_example.yaml")
    cfg = _svr_config("conv")
    mirror = DPFMirror(cfg)
    mirror.randomize_(seed=13)
    a = convert_state_dict(mirror.state_dict())  # DEFAULT_RULES
    b = convert_state_dict(mirror.state_dict(), rules)
    fa = jax.tree_util.tree_flatten_with_path(a)
    fb = jax.tree_util.tree_flatten_with_path(b)
    assert [p for p, _ in fa[0]] == [p for p, _ in fb[0]]
    for (_, va), (_, vb) in zip(fa[0], fb[0]):
        np.testing.assert_array_equal(va, vb)


def test_unknown_key_strictness(converted):
    cfg, mirror, _, _, _ = converted
    sd = dict(mirror.state_dict())
    sd["mystery.weight"] = torch.zeros(3, 3)
    with pytest.raises(KeyError):
        convert_state_dict(sd, strict=True)
    params = convert_state_dict(sd, strict=False)  # skips the mystery key
    assert "mystery" not in params["params"]


def test_save_as_orbax_never_deletes_existing_steps(tmp_path):
    """Converting into a directory that already holds training checkpoints
    must not trigger orbax retention (review finding: the default
    max_to_keep=3 deleted the oldest existing step)."""
    import numpy as np

    from dpfx.compat import save_as_orbax
    from dpfx.train.trainer import CheckpointManager

    d = str(tmp_path / "ck")
    mgr = CheckpointManager(d)
    for s in (100, 200, 300):
        mgr.save_params(s, {"w": np.ones((2,), np.float32) * s})
    save_as_orbax({"w": np.zeros((2,), np.float32)}, d, step=0)
    steps = sorted(CheckpointManager(d).manager.all_steps())
    assert steps == [0, 100, 200, 300], steps


@pytest.mark.parametrize("reduction", ["sum_points", "mean_points"])
def test_training_trajectory_parity(reduction):
    """End-to-end gradient/optimizer oracle (round-3 VERDICT item 6): ~20
    Adam steps on identical batches + noise must produce the same loss
    trajectory in torch and JAX. Per-module parity tests can't catch
    gradient-convention drift (reduction scaling, KL sign, optimizer
    hyperparameters); this does."""
    import dataclasses

    from dpfx.compat.torch_mirror import train_trajectory_torch
    from dpfx.train import TrainState, init_state, make_optimizer, make_train_step

    cfg = tiny_config()
    cfg.train = dataclasses.replace(
        cfg.train, lr=1e-3, lr_schedule="constant", lr_warmup_steps=0,
        grad_clip=0.0, weight_decay=0.0, flat_optimizer=False,
        recon_reduction=reduction, skip_nonfinite_updates=False)
    mirror = DPFMirror(cfg)
    mirror.randomize_(seed=11)
    params = convert_state_dict(mirror.state_dict())

    steps = 20
    rng = np.random.default_rng(7)
    batches = [rng.normal(size=(8, 32, 3)).astype(np.float32) * 0.5
               for _ in range(steps)]
    eps_list = [rng.normal(size=(8, cfg.model.dz)).astype(np.float32)
                for _ in range(steps)]

    torch_losses = train_trajectory_torch(
        mirror, batches, eps_list, lr=1e-3, recon_reduction=reduction)

    model = DPF(cfg)
    tx = make_optimizer(cfg.train)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    step_fn = make_train_step(model, tx, cfg, mesh=None)
    key = jax.random.PRNGKey(0)
    jax_losses = []
    for x, eps in zip(batches, eps_list):
        state, m = step_fn(state, {"x": jnp.asarray(x),
                                   "eps": jnp.asarray(eps)}, key)
        jax_losses.append(float(m["loss"]))

    # f32 noise compounds over 20 optimizer steps; the trajectories must
    # stay within a fraction of a percent throughout
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=5e-3,
                               err_msg=f"reduction={reduction}")
    # and tightly at the start (catches any systematic convention drift)
    np.testing.assert_allclose(jax_losses[:3], torch_losses[:3], rtol=3e-4)
