"""Sampling-temperature lever (round-5 v3 quality knob).

tau_p scales the point base noise (u = tau_p * N(0, I3)), tau_z the latent
base noise (eps = tau_z * N(0, I_dz)); tau = 1 must be the unmodified
sampler bit-for-bit so every parity-grade table stays on the reference
protocol (SURVEY.md §3.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpfx.models import DPF
from dpfx.ops.fused_sampler import fused_sample_points, stack_point_flow_params
from dpfx.sampling import make_sampler
from tests.test_models import tiny_config


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_config()
    model = DPF(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 3))
    params = model.init(rng, x, rng)
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.PRNGKey(1), p.shape), params
    )
    return cfg, model, params


def test_model_sample_temperature_parity(model_and_params):
    """DPF.sample(tau_p, tau_z) == manual eps*tau_z -> latent inverse,
    u*tau_p -> point inverse with the SAME rng splits (exact)."""
    cfg, model, params = model_and_params
    rng = jax.random.PRNGKey(7)
    tau_p, tau_z = 0.7, 0.5
    out = model.apply(params, rng, 4, 32, tau_p, tau_z, method=model.sample)

    rng_z, rng_u = jax.random.split(rng)
    eps = jax.random.normal(rng_z, (4, cfg.model.dz)) * tau_z
    z, _ = model.apply(params, eps, method=lambda m, e: m.latent_flow.inverse(e))
    u = jax.random.normal(rng_u, (4, 32, 3)) * tau_p
    x, _ = model.apply(params, u, z, method=lambda m, a, b: m.point_flow.inverse(a, b))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_default_temperature_is_identity(model_and_params):
    """temperature=1.0 explicit == omitted, bit-identical on both the fused
    and the XLA sampler paths (the knob must not perturb the reference
    protocol)."""
    cfg, model, params = model_and_params
    rng = jax.random.PRNGKey(3)
    for fused in (True, False):
        base = make_sampler(model, params, 8, 64, fused=fused)(rng)
        expl = make_sampler(model, params, 8, 64, fused=fused,
                            temperature=1.0, latent_temperature=1.0)(rng)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(expl))


@pytest.mark.parametrize("fused", [True, False])
def test_temperature_shrinks_point_spread(model_and_params, fused):
    """tau_p < 1 contracts the per-cloud point spread (same rng stream)."""
    cfg, model, params = model_and_params
    rng = jax.random.PRNGKey(5)
    hot = make_sampler(model, params, 8, 128, fused=fused)(rng)
    cold = make_sampler(model, params, 8, 128, fused=fused, temperature=0.3)(rng)
    spread = lambda c: float(jnp.mean(jnp.var(c, axis=1)))
    assert np.isfinite(np.asarray(cold)).all()
    assert spread(cold) < spread(hot)


def test_latent_temperature_shrinks_shape_diversity(model_and_params):
    """tau_z < 1 contracts cross-cloud (shape) diversity: the variance of
    per-cloud means collapses toward the prior-flow image of 0."""
    cfg, model, params = model_and_params
    rng = jax.random.PRNGKey(9)
    hot = make_sampler(model, params, 32, 64)(rng)
    cold = make_sampler(model, params, 32, 64, latent_temperature=0.05)(rng)
    div = lambda c: float(jnp.var(jnp.mean(c, axis=1), axis=0).sum())
    assert div(cold) < div(hot)


def test_fused_noise_scale_zero_collapses(model_and_params):
    """noise_scale=0 -> every point in a cloud is the flow image of u=0:
    per-cloud point variance is exactly the degenerate case."""
    cfg, model, params = model_and_params
    sp = stack_point_flow_params(params, cfg.model.point_flow.scale_cap)
    z = jax.random.normal(jax.random.PRNGKey(2), (4, cfg.model.dz))
    x = np.asarray(fused_sample_points(sp, z, jnp.int32(11), 64, tile=128,
                                       noise_scale=0.0))
    assert np.isfinite(x).all()
    # all points within a cloud identical (u=0 for every point)
    np.testing.assert_allclose(
        x, np.broadcast_to(x[:, :1, :], x.shape), rtol=0, atol=1e-6)


def test_sharded_sampler_temperature(model_and_params):
    """Temperature threads through the mesh-sharded sampler; tau=1 stays
    bit-identical to the default sharded path."""
    from dpfx.parallel.mesh import create_mesh

    cfg, model, params = model_and_params
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = create_mesh(cfg.parallel.axis_name)
    rng = jax.random.PRNGKey(4)
    base = make_sampler(model, params, 16, 64, mesh=mesh)(rng)
    expl = make_sampler(model, params, 16, 64, mesh=mesh,
                        temperature=1.0, latent_temperature=1.0)(rng)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(expl))
    cold = make_sampler(model, params, 16, 64, mesh=mesh, temperature=0.3)(rng)
    assert cold.shape == (16, 64, 3)
    s = lambda c: float(jnp.mean(jnp.var(c, axis=1)))
    assert s(cold) < s(base)


def test_eval_temperature_config_roundtrip():
    """eval.temperature / eval.latent_temperature parse from overrides and
    default to 1.0 (the reference protocol)."""
    from dpfx.config import config_from_dict

    cfg = config_from_dict({"experiment": "gen"})
    assert cfg.eval.temperature == 1.0 and cfg.eval.latent_temperature == 1.0
    cfg2 = config_from_dict(
        {"experiment": "gen",
         "eval": {"temperature": 0.85, "latent_temperature": 0.9}})
    assert cfg2.eval.temperature == 0.85
    assert cfg2.eval.latent_temperature == 0.9
