"""CD kernel parity tests (SURVEY.md §4 metric parity oracles): Pallas
(interpret mode on CPU) vs jnp oracle vs independent torch-CPU oracle,
plus backward checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpfx.ops import (
    chamfer,
    chamfer_pairwise,
    chamfer_parts,
    nn_distances,
    nn_distances_all,
    nn_distances_jnp,
)


def clouds(key, b, n, m):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    return jax.random.normal(k1, (b, n, 3)), jax.random.normal(k2, (b, m, 3))


def torch_nnd(x, y):
    """Independent torch-CPU oracle (SURVEY.md §4: torch used only as oracle)."""
    import torch

    xt = torch.from_numpy(np.asarray(x))
    yt = torch.from_numpy(np.asarray(y))
    d = torch.cdist(xt, yt, p=2) ** 2
    return d.min(dim=-1).values.numpy(), d.min(dim=-2).values.numpy()


@pytest.mark.parametrize("n,m", [(64, 64), (100, 60), (33, 129)])
def test_pallas_matches_jnp_oracle(n, m):
    x, y = clouds(0, 3, n, m)
    dl_p, dr_p = nn_distances(x, y, impl="pallas")
    dl_j, _, dr_j, _ = nn_distances_jnp(x, y)
    np.testing.assert_allclose(np.asarray(dl_p), np.asarray(dl_j), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dr_p), np.asarray(dr_j), rtol=1e-5, atol=1e-5)


def test_jnp_matches_torch_oracle():
    x, y = clouds(1, 2, 80, 80)
    dl, _, dr, _ = nn_distances_jnp(x, y)
    dl_t, dr_t = torch_nnd(x, y)
    np.testing.assert_allclose(np.asarray(dl), dl_t, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dr), dr_t, rtol=1e-4, atol=1e-5)


def test_chamfer_zero_on_identical():
    x, _ = clouds(2, 2, 64, 64)
    cd = chamfer(x, x, impl="pallas")
    np.testing.assert_allclose(np.asarray(cd), 0.0, atol=1e-5)


def test_chamfer_parts_sum():
    x, y = clouds(3, 2, 64, 96)
    a, b = chamfer_parts(x, y, impl="pallas")
    cd = chamfer(x, y, impl="pallas")
    np.testing.assert_allclose(np.asarray(a + b), np.asarray(cd), rtol=1e-6)


@pytest.mark.parametrize("impl", ["jnp", "pallas"])
def test_chamfer_gradients_match_autodiff_of_oracle(impl):
    """custom_vjp (argmin-gather backward) vs jax.grad through the full
    jnp min (subgradient convention agrees a.e. for generic clouds)."""
    x, y = clouds(4, 2, 48, 40)

    def loss_custom(x, y):
        return jnp.sum(chamfer(x, y, impl=impl))

    def loss_dense(x, y):
        from dpfx.ops import sqdist_matrix

        d = sqdist_matrix(x, y)
        return jnp.sum(jnp.mean(jnp.min(d, -1), -1) + jnp.mean(jnp.min(d, -2), -1))

    gx1, gy1 = jax.grad(loss_custom, argnums=(0, 1))(x, y)
    gx2, gy2 = jax.grad(loss_dense, argnums=(0, 1))(x, y)
    # near-equidistant neighbors make the subgradient choice path-dependent
    # (kernel equality-mask vs XLA min-autodiff); on the real chip the two
    # paths' last-ulp distance differences flip some choices — agreement is
    # absolute-tight, not relative-tight
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gy1), np.asarray(gy2), rtol=1e-2, atol=2e-3)


def test_pairwise_matches_diag_and_oracle():
    xs, _ = clouds(5, 5, 64, 64)
    ys, _ = clouds(6, 4, 64, 64)
    cdm_p = chamfer_pairwise(xs, ys, impl="pallas")
    cdm_j = chamfer_pairwise(xs, ys, impl="jnp")
    assert cdm_p.shape == (5, 4)
    np.testing.assert_allclose(np.asarray(cdm_p), np.asarray(cdm_j), rtol=1e-5, atol=1e-5)
    # row 0 of the matrix == diagonal chamfer of (x0 vs each y)
    x0 = jnp.broadcast_to(xs[0], (4, 64, 3))
    np.testing.assert_allclose(
        np.asarray(chamfer(x0, ys, impl="jnp")), np.asarray(cdm_p[0]), rtol=1e-5, atol=1e-5
    )


def test_pairwise_ragged_sizes():
    xs, _ = clouds(7, 3, 50, 50)
    ys, _ = clouds(8, 2, 70, 70)
    cdm = chamfer_pairwise(xs, ys, impl="pallas")
    cdm_j = chamfer_pairwise(xs, ys, impl="jnp")
    np.testing.assert_allclose(np.asarray(cdm), np.asarray(cdm_j), rtol=1e-5, atol=1e-5)


def test_pairwise_symmetric_mode_matches_full():
    """symmetric=True (upper triangle + mirror) must equal the full
    computation exactly — CD is symmetric in its arguments."""
    import numpy as np

    from dpfx.ops.chamfer import chamfer_pairwise

    rng = np.random.default_rng(11)
    xs = jnp.asarray(rng.normal(size=(7, 96, 3)))
    full = np.asarray(chamfer_pairwise(xs, xs))
    tri = np.asarray(chamfer_pairwise(xs, xs, symmetric=True))
    np.testing.assert_allclose(tri, full, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(tri, tri.T, rtol=0, atol=0)  # exactly mirrored
