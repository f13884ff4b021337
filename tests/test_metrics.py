"""Generation-metric suite tests (SURVEY.md §4): hand-checked MMD/COV,
1-NNA sanity on separable/identical sets, JSD properties, mesh-sharded
pairwise matrices, and end-to-end eval protocols on a tiny model."""

import jax
import jax.numpy as jnp
import numpy as np

from dpfx.metrics import (
    compute_all_metrics,
    jsd_between_sets,
    mmd_cov,
    one_nna,
    pairwise_matrix,
)
from dpfx.parallel import create_mesh


def test_mmd_cov_hand_example():
    # gen 0 closest to ref 0 and 1; gen 1 closest to nothing new
    m = np.array([[0.1, 0.2, 0.9], [0.5, 0.6, 0.8]])
    out = mmd_cov(m)
    # MMD: per-ref min over gen: [0.1, 0.2, 0.8] -> mean
    np.testing.assert_allclose(out["mmd"], np.mean([0.1, 0.2, 0.8]))
    # argmin per gen row: gen0 -> ref0, gen1 -> ref0 => unique {0} -> 1/3
    np.testing.assert_allclose(out["cov"], 1 / 3)


def test_one_nna_separable_vs_identical():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(20, 16, 3)).astype(np.float32)
    far = a + 100.0  # perfectly separable fake set
    m_gg = np.asarray(pairwise_matrix(jnp.asarray(far), jnp.asarray(far), "cd", "jnp"))
    m_rr = np.asarray(pairwise_matrix(jnp.asarray(a), jnp.asarray(a), "cd", "jnp"))
    m_gr = np.asarray(pairwise_matrix(jnp.asarray(far), jnp.asarray(a), "cd", "jnp"))
    assert one_nna(m_gg, m_gr, m_rr) == 1.0  # fully distinguishable

    # identical marginals: two halves of the same distribution ≈ 50%
    b = rng.normal(size=(20, 16, 3)).astype(np.float32)
    m_gg = np.asarray(pairwise_matrix(jnp.asarray(b), jnp.asarray(b), "cd", "jnp"))
    m_gr = np.asarray(pairwise_matrix(jnp.asarray(b), jnp.asarray(a), "cd", "jnp"))
    acc = one_nna(m_gg, m_gr, m_rr)
    assert 0.2 <= acc <= 0.8, acc


def test_jsd_properties():
    rng = np.random.default_rng(1)
    a = np.tanh(rng.normal(size=(10, 64, 3))).astype(np.float32)
    assert jsd_between_sets(a, a) < 1e-12
    b = np.tanh(rng.normal(size=(10, 64, 3)) + 2.0).astype(np.float32)
    assert jsd_between_sets(a, b) > 0.01


def test_pairwise_matrix_sharded_matches_unsharded():
    k = jax.random.PRNGKey(0)
    xs = jax.random.normal(k, (10, 32, 3))
    ys = jax.random.normal(jax.random.fold_in(k, 1), (6, 32, 3))
    mesh = create_mesh()
    m0 = np.asarray(pairwise_matrix(xs, ys, "cd", "jnp"))
    m1 = np.asarray(pairwise_matrix(xs, ys, "cd", "jnp", mesh=mesh, row_chunk=2))
    np.testing.assert_allclose(m0, m1, rtol=1e-5, atol=1e-6)
    m2 = np.asarray(pairwise_matrix(xs, ys, "cd", "pallas", mesh=mesh, row_chunk=2))
    np.testing.assert_allclose(m0, m2, rtol=1e-4, atol=1e-5)


def test_compute_all_metrics_keys():
    k = jax.random.PRNGKey(2)
    gen = jax.random.normal(k, (8, 24, 3)) * 0.3
    ref = jax.random.normal(jax.random.fold_in(k, 1), (8, 24, 3)) * 0.3
    out = compute_all_metrics(gen, ref, metrics=("cd",), impl="jnp")
    assert set(out) == {"mmd-cd", "cov-cd", "1-nna-cd", "jsd"}
    assert all(np.isfinite(v) for v in out.values())


def test_eval_protocols_end_to_end(tmp_path):
    """AE + gen eval on a tiny freshly-initialized model (smoke; values
    finite, shapes right)."""
    from dpfx.metrics import evaluate_generation, evaluate_reconstruction
    from dpfx.models import DPF
    from tests.test_models import tiny_config

    cfg = tiny_config()
    model = DPF(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 32, 3))
    params = model.init(rng, x, rng)
    clouds = np.asarray(jax.random.normal(jax.random.fold_in(rng, 1), (12, 32, 3)))

    out = evaluate_reconstruction(model, params, clouds, cfg, rng, impl="jnp")
    assert np.isfinite(out["recon-cd"])

    out = evaluate_generation(model, params, clouds, cfg, rng, impl="jnp", sample_batch=8)
    assert np.isfinite(out["mmd-cd"]) and np.isfinite(out["jsd"])
