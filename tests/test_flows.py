"""Flow property tests (SURVEY.md §4): invertibility, log-det vs autodiff,
identity-at-init, conditioning sensitivity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpfx.models import CouplingFlow, make_masks


def _init_flow(dim, cond_dim=None, n_layers=6, hidden=32, use_actnorm=False, seed=0):
    flow = CouplingFlow(
        dim=dim, n_layers=n_layers, hidden=hidden, n_hidden=2, use_actnorm=use_actnorm
    )
    rng = jax.random.PRNGKey(seed)
    if cond_dim is None:
        x = jax.random.normal(rng, (4, dim))
        params = flow.init(rng, x)
        cond = None
    else:
        x = jax.random.normal(rng, (4, 16, dim))
        cond = jax.random.normal(jax.random.fold_in(rng, 1), (4, cond_dim))
        params = flow.init(rng, x, cond)
    return flow, params, x, cond


def test_masks_cover_all_coords():
    for dim in (3, 8, 64):
        masks = make_masks(dim, 12)
        transformed = (1.0 - masks).sum(axis=0)
        assert (transformed > 0).all(), f"some coord never transformed, dim={dim}"
        # every layer must pass through and transform at least one coord
        assert (masks.sum(axis=1) >= 1).all()
        assert ((1 - masks).sum(axis=1) >= 1).all()


@pytest.mark.parametrize("use_actnorm", [False, True])
def test_unconditional_invertibility(use_actnorm):
    flow, params, x, _ = _init_flow(dim=8, use_actnorm=use_actnorm, seed=1)
    # perturb params away from identity-init so the test is non-trivial
    params = jax.tree.map(
        lambda p: p + 0.1 * jax.random.normal(jax.random.PRNGKey(2), p.shape), params
    )
    u, ld_f = flow.apply(params, x, method=flow.forward)
    x2, ld_i = flow.apply(params, u, method=flow.inverse)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=1e-5)


def test_conditional_invertibility():
    flow, params, x, cond = _init_flow(dim=3, cond_dim=16, seed=3)
    params = jax.tree.map(
        lambda p: p + 0.1 * jax.random.normal(jax.random.PRNGKey(4), p.shape), params
    )
    u, _ = flow.apply(params, x, cond, method=flow.forward)
    x2, _ = flow.apply(params, u, cond, method=flow.inverse)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-5, atol=1e-5)


def test_identity_at_init():
    """Zero-init final conditioner layers -> flow is the identity at init."""
    flow, params, x, cond = _init_flow(dim=3, cond_dim=8, seed=5)
    u, ld = flow.apply(params, x, cond, method=flow.forward)
    np.testing.assert_allclose(np.asarray(u), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-6)


def test_logdet_matches_autodiff_unconditional():
    flow, params, x, _ = _init_flow(dim=4, n_layers=4, seed=6)
    params = jax.tree.map(
        lambda p: p + 0.2 * jax.random.normal(jax.random.PRNGKey(7), p.shape), params
    )

    def f_single(xi):
        u, _ = flow.apply(params, xi[None], method=flow.forward)
        return u[0]

    _, ld = flow.apply(params, x, method=flow.forward)
    for i in range(x.shape[0]):
        J = jax.jacfwd(f_single)(x[i])
        _, analytic_ld = np.linalg.slogdet(np.asarray(J))
        np.testing.assert_allclose(np.asarray(ld[i]), analytic_ld, rtol=1e-4, atol=1e-5)


def test_logdet_matches_autodiff_conditional():
    flow, params, x, cond = _init_flow(dim=3, cond_dim=8, n_layers=5, seed=8)
    params = jax.tree.map(
        lambda p: p + 0.2 * jax.random.normal(jax.random.PRNGKey(9), p.shape), params
    )

    def f_single(xi, ci):
        u, _ = flow.apply(params, xi[None, None], ci[None], method=flow.forward)
        return u[0, 0]

    _, ld = flow.apply(params, x, cond, method=flow.forward)
    for b in (0, 1):
        J = jax.jacfwd(f_single)(x[b, 0], cond[b])
        _, analytic_ld = np.linalg.slogdet(np.asarray(J))
        np.testing.assert_allclose(np.asarray(ld[b, 0]), analytic_ld, rtol=1e-4, atol=1e-5)


def test_log_prob_integrates_consistently():
    """log_prob should equal base logprob + logdet and be finite."""
    flow, params, x, cond = _init_flow(dim=3, cond_dim=8, seed=10)
    lp = flow.apply(params, x, cond, method=flow.log_prob)
    assert lp.shape == x.shape[:-1]
    assert np.isfinite(np.asarray(lp)).all()
    # at identity init, log_prob(x) == standard normal log density
    expected = -0.5 * np.sum(np.asarray(x) ** 2 + np.log(2 * np.pi), axis=-1)
    np.testing.assert_allclose(np.asarray(lp), expected, rtol=1e-5, atol=1e-5)


def test_conditioning_changes_output():
    flow, params, x, cond = _init_flow(dim=3, cond_dim=8, seed=11)
    params = jax.tree.map(
        lambda p: p + 0.3 * jax.random.normal(jax.random.PRNGKey(12), p.shape), params
    )
    u1, _ = flow.apply(params, x, cond, method=flow.forward)
    u2, _ = flow.apply(params, x, cond + 1.0, method=flow.forward)
    assert not np.allclose(np.asarray(u1), np.asarray(u2))
