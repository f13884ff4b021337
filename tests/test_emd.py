"""EMD (approxmatch) parity tests: Pallas kernel vs jnp oracle vs an
independent torch-CPU oracle implementing the same schedule
(SURVEY.md §4, §8 hard-part 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpfx.ops import approx_match_jnp, emd, emd_jnp, emd_nograd, emd_pairwise, match_levels


def clouds(key, b, n, m):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    return (
        jax.random.normal(k1, (b, n, 3)) * 0.5,
        jax.random.normal(k2, (b, m, 3)) * 0.5,
    )


def torch_approxmatch_emd(x, y, n_iters=10):
    """Independent oracle: same documented schedule, written in torch."""
    import torch

    x = torch.from_numpy(np.asarray(x)).double()
    y = torch.from_numpy(np.asarray(y)).double()
    n, m = x.shape[-2], y.shape[-2]
    d = torch.cdist(x, y, p=2) ** 2
    factorl, factorr = max(n, m) / n, max(n, m) / m
    remainl = torch.full((x.shape[0], n, 1), factorl, dtype=torch.float64)
    remainr = torch.full((x.shape[0], 1, m), factorr, dtype=torch.float64)
    match = torch.zeros(x.shape[0], n, m, dtype=torch.float64)
    for level in match_levels(n_iters):
        w = torch.exp(level * d) * remainr
        ss = w / (w.sum(-1, keepdim=True) + 1e-9) * remainl
        colsum = ss.sum(-2, keepdim=True)
        ratio = torch.clamp(remainr / (colsum + 1e-9), max=1.0)
        delta = ss * ratio
        match = match + delta
        remainl = torch.clamp(remainl - delta.sum(-1, keepdim=True), min=0.0)
        remainr = torch.clamp(remainr - colsum * ratio, min=0.0)
    cost = (match * torch.cdist(x, y, p=2)).sum((-2, -1))
    return (cost / n).numpy()


def test_match_levels_schedule():
    lv = match_levels(10)
    assert lv[0] == -(4.0 ** 7)
    assert lv[-1] == 0.0
    assert len(lv) == 10


def test_match_is_transport_plan():
    """After the level-0 iteration all mass is placed: rows sum to factorl,
    cols to factorr (within fp tolerance)."""
    x, y = clouds(0, 2, 48, 64)
    match = approx_match_jnp(x, y)
    rows = np.asarray(jnp.sum(match, axis=-1))
    cols = np.asarray(jnp.sum(match, axis=-2))
    np.testing.assert_allclose(rows, 64 / 48, rtol=1e-3)
    np.testing.assert_allclose(cols, 1.0, rtol=1e-3)


def test_jnp_matches_torch_oracle():
    x, y = clouds(1, 2, 40, 40)
    e_j = np.asarray(emd_jnp(x, y))
    e_t = torch_approxmatch_emd(x, y)
    np.testing.assert_allclose(e_j, e_t, rtol=1e-4)


@pytest.mark.parametrize("n,m", [(64, 64), (48, 80)])
def test_pallas_matches_jnp(n, m):
    x, y = clouds(2, 2, n, m)
    e_p = np.asarray(emd_nograd(x, y, impl="pallas"))
    e_j = np.asarray(emd_nograd(x, y, impl="jnp"))
    np.testing.assert_allclose(e_p, e_j, rtol=1e-4, atol=1e-5)


def test_emd_near_zero_on_identical():
    x, _ = clouds(3, 2, 64, 64)
    e = np.asarray(emd_nograd(x, x, impl="pallas"))
    # exact-zero distances give zero cost wherever mass lands on the diagonal;
    # approxmatch places it there because exp(level*0)=1 dominates
    assert (e < 1e-3).all(), e


def test_emd_grad_pallas_matches_jnp():
    x, y = clouds(4, 2, 32, 48)

    def loss(impl):
        return lambda x, y: jnp.sum(emd(x, y, impl))

    gx_p, gy_p = jax.grad(loss("pallas"), argnums=(0, 1))(x, y)
    gx_j, gy_j = jax.grad(loss("jnp"), argnums=(0, 1))(x, y)
    # approxmatch is fp-chaotic: exp(-4^j * d) amplifies f32 association
    # differences between executions through the saturation recursion, so
    # per-point grads agree loosely while the cost agrees to 1e-4
    # (test_pallas_matches_jnp). Same caveat applies vs the CUDA reference.
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_j), rtol=0.15, atol=3e-3)
    np.testing.assert_allclose(np.asarray(gy_p), np.asarray(gy_j), rtol=0.15, atol=3e-3)


def test_emd_grad_direction_reduces_cost():
    """Gradient descent on EMD must actually reduce it (end-to-end sanity)."""
    x, y = clouds(5, 1, 32, 32)
    g = jax.grad(lambda x: jnp.sum(emd(x, y, "jnp")))(x)
    e0 = float(emd_nograd(x, y, "jnp")[0])
    e1 = float(emd_nograd(x - 0.05 * g, y, "jnp")[0])
    assert e1 < e0


def test_emd_pairwise_matches_diag():
    xs, _ = clouds(6, 3, 40, 40)
    ys, _ = clouds(7, 2, 40, 40)
    m_j = np.asarray(emd_pairwise(xs, ys, impl="jnp"))
    # exact pallas: fp-chaos tolerance only
    m_e = np.asarray(emd_pairwise(xs, ys, impl="pallas", precision="exact"))
    assert m_e.shape == (3, 2)
    np.testing.assert_allclose(m_e, m_j, rtol=1e-3, atol=1e-4)
    # fast pallas (bf16 w-cache): documented drift budget — ~1e-3 relative
    # on CPU interpret, up to ~1e-2 on the real chip where Mosaic-vs-XLA
    # execution differences compound through the annealing recursion
    m_f = np.asarray(emd_pairwise(xs, ys, impl="pallas", precision="fast"))
    np.testing.assert_allclose(m_f, m_j, rtol=2e-2, atol=1e-3)


def test_exact_cache_bit_identical():
    """Round-4 exact-mode speedup (f32 d-cache + ss-cache): the cached
    kernel must be BIT-identical to the uncached exact path — the caches
    only reuse values the uncached path recomputes with the same ops."""
    import importlib

    E = importlib.import_module("dpfx.ops.emd")
    rng = np.random.default_rng(4)
    xs = jnp.asarray(rng.normal(size=(3, 96, 3)).astype(np.float32))
    ys = jnp.asarray(rng.normal(size=(4, 100, 3)).astype(np.float32))
    assert E.EMD_EXACT_CACHE  # default on
    m_cached = np.asarray(E.emd_pairwise(xs, ys, impl="pallas",
                                         precision="exact"))
    old = E.EMD_EXACT_CACHE
    try:
        E.EMD_EXACT_CACHE = False
        m_plain = np.asarray(E.emd_pairwise(xs, ys, impl="pallas",
                                            precision="exact"))
    finally:
        E.EMD_EXACT_CACHE = old
    np.testing.assert_array_equal(m_cached, m_plain)
