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


def test_unknown_key_strictness(converted):
    cfg, mirror, _, _, _ = converted
    sd = dict(mirror.state_dict())
    sd["mystery.weight"] = torch.zeros(3, 3)
    with pytest.raises(KeyError):
        convert_state_dict(sd, strict=True)
    params = convert_state_dict(sd, strict=False)  # skips the mystery key
    assert "mystery" not in params["params"]
