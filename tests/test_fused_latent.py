"""Fused latent-flow kernel parity: log_prob + every gradient must match
the flax CouplingFlow path (interpret mode on CPU; real lowering covered
by the on-chip suite ritual)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpfx.config import config_from_dict
from dpfx.models import DPF
from dpfx.ops.fused_latent import (
    fused_latent_inverse,
    fused_latent_log_prob,
    fused_latent_supported,
)


def _cfg(dz=32, n_layers=6, hidden=48, n_hidden=2):
    return config_from_dict({
        "experiment": "gen", "name": "t",
        "model": {
            "dz": dz,
            "point_flow": {"n_layers": 4, "hidden": 32, "n_hidden": 2},
            "latent_flow": {"n_layers": n_layers, "hidden": hidden,
                            "n_hidden": n_hidden},
            "encoder": {"point_widths": [32, 64], "head_widths": [32]},
        },
        "data": {"dataset": "synthetic", "n_points": 64, "synthetic_size": 16},
    })


@pytest.fixture(scope="module")
def model_and_params():
    cfg = _cfg()
    model = DPF(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jax.random.normal(rng, (2, 16, 3)), rng)
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.PRNGKey(1), p.shape),
        params)
    return cfg, model, params


def _flax_logp(model, params, z):
    return model.apply(params, z, method=lambda m, z_: m.latent_flow.log_prob(z_))


def test_log_prob_matches_flax(model_and_params):
    cfg, model, params = model_and_params
    assert fused_latent_supported(cfg.model.latent_flow, cfg.model.dz)
    z = jax.random.normal(jax.random.PRNGKey(2), (5, cfg.model.dz))
    ref = np.asarray(_flax_logp(model, params, z))
    got = np.asarray(fused_latent_log_prob(params, z, cfg.model.latent_flow))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_log_prob_grads_match_flax(model_and_params):
    cfg, model, params = model_and_params
    z = jax.random.normal(jax.random.PRNGKey(3), (4, cfg.model.dz))

    def loss_ref(p, zz):
        return jnp.sum(_flax_logp(model, p, zz) * jnp.arange(1.0, 5.0))

    def loss_fused(p, zz):
        return jnp.sum(
            fused_latent_log_prob(p, zz, cfg.model.latent_flow)
            * jnp.arange(1.0, 5.0))

    gr_p, gr_z = jax.grad(loss_ref, argnums=(0, 1))(params, z)
    gf_p, gf_z = jax.grad(loss_fused, argnums=(0, 1))(params, z)
    np.testing.assert_allclose(np.asarray(gf_z), np.asarray(gr_z),
                               rtol=5e-4, atol=5e-5)
    ref_leaves = jax.tree_util.tree_flatten_with_path(gr_p)[0]
    got = dict(jax.tree_util.tree_flatten_with_path(gf_p)[0])
    for path, leaf in ref_leaves:
        g = got[path]
        if "latent_flow" not in jax.tree_util.keystr(path):
            # only the latent flow participates in this loss
            np.testing.assert_array_equal(np.asarray(g), 0.0 * np.asarray(leaf))
            continue
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(leaf), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(path))


def test_inverse_matches_flax(model_and_params):
    cfg, model, params = model_and_params
    eps = jax.random.normal(jax.random.PRNGKey(4), (7, cfg.model.dz))
    ref, _ = model.apply(params, eps,
                         method=lambda m, e: m.latent_flow.inverse(e))
    got = fused_latent_inverse(params, eps, cfg.model.latent_flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # and the fused fwd is the exact inverse of the fused inverse
    logp = fused_latent_log_prob(params, got, cfg.model.latent_flow)
    assert np.isfinite(np.asarray(logp)).all()


def test_batch_padding_and_multi_tile():
    """Non-128-multiple batches (lane padding) and B > 128 (multi-grid-step
    weight-grad accumulation) both match flax."""
    cfg = _cfg(dz=24, n_layers=3, hidden=32)
    model = DPF(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jax.random.normal(rng, (2, 16, 3)), rng)
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.PRNGKey(1), p.shape),
        params)
    for b in (1, 5, 130, 200):
        z = jax.random.normal(jax.random.fold_in(rng, b), (b, cfg.model.dz))
        ref = np.asarray(_flax_logp(model, params, z))
        got = np.asarray(fused_latent_log_prob(params, z, cfg.model.latent_flow))
        # rtol 2e-4: the real chip's f32 matmul rounding differs from
        # XLA's op order by up to ~7e-5 rel on this fixture (DPFX_TEST_TPU
        # run, round 3); interpret mode matches far tighter
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=5e-5)

    # weight grads with B=200 (two grid steps accumulate)
    z = jax.random.normal(jax.random.fold_in(rng, 99), (200, cfg.model.dz))
    gr = jax.grad(lambda p: jnp.sum(_flax_logp(model, p, z)))(params)
    gf = jax.grad(lambda p: jnp.sum(
        fused_latent_log_prob(p, z, cfg.model.latent_flow)))(params)
    for (pa, a), (_, b_) in zip(
            jax.tree_util.tree_flatten_with_path(gr)[0],
            jax.tree_util.tree_flatten_with_path(gf)[0]):
        if "latent_flow" in jax.tree_util.keystr(pa):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       rtol=1e-3, atol=1e-4,
                                       err_msg=jax.tree_util.keystr(pa))
