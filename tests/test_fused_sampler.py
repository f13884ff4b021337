"""Fused sampling kernel parity (SURVEY.md §8 step 7): the Pallas fused
inverse must reproduce CouplingFlow.inverse to f32 tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpfx.models import DPF
from dpfx.ops.fused_sampler import fused_point_flow_inverse, stack_point_flow_params
from tests.test_models import tiny_config


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_config()
    model = DPF(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 3))
    params = model.init(rng, x, rng)
    # perturb away from identity init
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.PRNGKey(1), p.shape), params
    )
    return cfg, model, params


def test_fused_matches_flax_inverse(model_and_params):
    cfg, model, params = model_and_params
    sp = stack_point_flow_params(params, cfg.model.point_flow.scale_cap)
    rng = jax.random.PRNGKey(2)
    u = jax.random.normal(rng, (3, 100, 3))
    z = jax.random.normal(jax.random.fold_in(rng, 1), (3, cfg.model.dz))

    x_ref, _ = model.apply(
        params, u, z, method=lambda m, a, b: m.point_flow.inverse(a, b)
    )
    x_fused = fused_point_flow_inverse(sp, u, z, tile=128, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(x_fused), np.asarray(x_ref), rtol=1e-5, atol=1e-5
    )


def test_fused_bf16_close(model_and_params):
    cfg, model, params = model_and_params
    sp = stack_point_flow_params(params, cfg.model.point_flow.scale_cap)
    rng = jax.random.PRNGKey(3)
    u = jax.random.normal(rng, (2, 64, 3))
    z = jax.random.normal(jax.random.fold_in(rng, 1), (2, cfg.model.dz))
    x_ref, _ = model.apply(
        params, u, z, method=lambda m, a, b: m.point_flow.inverse(a, b)
    )
    x16 = fused_point_flow_inverse(sp, u, z, tile=64, dtype=jnp.bfloat16)
    # bf16 conditioner matmuls: loose distributional agreement
    np.testing.assert_allclose(np.asarray(x16), np.asarray(x_ref), rtol=0.1, atol=0.05)


def test_fused_tiling_invariance(model_and_params):
    cfg, model, params = model_and_params
    sp = stack_point_flow_params(params, cfg.model.point_flow.scale_cap)
    rng = jax.random.PRNGKey(4)
    u = jax.random.normal(rng, (2, 200, 3))  # non-multiple of tile
    z = jax.random.normal(jax.random.fold_in(rng, 1), (2, cfg.model.dz))
    a = fused_point_flow_inverse(sp, u, z, tile=64, dtype=jnp.float32)
    b = fused_point_flow_inverse(sp, u, z, tile=256, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="in-kernel PRNG has no interpret-mode lowering")
def test_sample_clouds_per_step_invariance():
    """clouds_per_step only changes the kernel schedule: the per-cloud noise
    stream is seeded by GLOBAL cloud index, so G=1/2/8 are bit-identical."""
    from dpfx.ops.fused_sampler import fused_sample_points

    cfg, model, params = (lambda c: (c, DPF(c), None))(tiny_config())
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jax.random.normal(rng, (2, 16, 3)), rng)
    sp = stack_point_flow_params(params, cfg.model.point_flow.scale_cap)
    z = jax.random.normal(jax.random.PRNGKey(3), (8, cfg.model.dz))
    outs = [
        np.asarray(fused_sample_points(sp, z, jnp.int32(7), 256, tile=128,
                                       clouds_per_step=g))
        for g in (1, 2, 8)
    ]
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])
    assert np.isfinite(outs[0]).all()
