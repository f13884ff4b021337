"""Golden end-to-end regression fixture (SURVEY.md §4): tiny model, fixed
PRNG, fixed synthetic batch -> the loss trajectory and sample statistics
must reproduce exactly across refactors (CPU backend; values pinned from
the first green run). This is the regression net the reference never had."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dpfx.models import DPF
from dpfx.train import init_state, make_optimizer, make_train_step
from tests.test_models import tiny_config

# Pinned on 2026-08-16, jax 0.9.0 CPU, from the first green run. If these
# move, a numerical behavior change happened — decide deliberately, then
# re-pin.
# re-pinned 2026-08-16 after grad_clip=10 became the optimizer default
# re-pinned 2026-08-16 (round 2) after the default conditioner/encoder
# activation moved gelu -> relu (VERIFY-vs-reference; 1.6x train step).
# Sample stats are unchanged: init keeps `out` zero-init, so the flow is
# the identity map at init regardless of activation.
GOLDEN_LOSSES = {1: 210.269989014, 10: 166.441894531, 20: 150.062545776}
GOLDEN_SAMPLE_MEAN = 0.005876336
GOLDEN_SAMPLE_STD = 0.989893496


def test_golden_loss_trajectory():
    cfg = tiny_config()
    model = DPF(cfg)
    tx = make_optimizer(cfg.train)
    rng = jax.random.PRNGKey(42)
    state = init_state(model, cfg, rng, tx)
    step = make_train_step(model, tx, cfg, mesh=None)
    x = jax.random.normal(jax.random.PRNGKey(7), (8, 64, 3)) * 0.5

    seen = {}
    for i in range(1, 21):
        state, metrics = step(state, {"x": x}, rng)
        if i in GOLDEN_LOSSES:
            seen[i] = float(metrics["loss"])
    for k, v in GOLDEN_LOSSES.items():
        np.testing.assert_allclose(seen[k], v, rtol=5e-5, err_msg=f"step {k}")


def test_golden_sample_statistics():
    cfg = tiny_config()
    model = DPF(cfg)
    rng = jax.random.PRNGKey(42)
    params = model.init(rng, jnp.zeros((2, 16, 3)), rng)
    clouds = model.apply(params, jax.random.PRNGKey(3), 8, 128, method=model.sample)
    np.testing.assert_allclose(float(jnp.mean(clouds)), GOLDEN_SAMPLE_MEAN, atol=1e-5)
    np.testing.assert_allclose(float(jnp.std(clouds)), GOLDEN_SAMPLE_STD, atol=1e-5)
