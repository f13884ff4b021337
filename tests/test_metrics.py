"""Generation-metric suite tests (SURVEY.md §4): hand-checked MMD/COV,
1-NNA sanity on separable/identical sets, JSD properties, mesh-sharded
pairwise matrices, and end-to-end eval protocols on a tiny model."""

import pytest

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
    # jsd_fit/jsd_raw/jsd_frame: both-frames hedge, VERIFY #20 (round 5)
    assert set(out) == {"mmd-cd", "cov-cd", "1-nna-cd", "jsd",
                        "jsd_fit", "jsd_raw", "jsd_frame"}
    assert out["jsd_frame"] == "fit"
    assert all(np.isfinite(v) for k, v in out.items() if k != "jsd_frame")


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


# ---------------------------------------------------------------------------
# PointFlow-lineage JSD oracle (independent transcription — sklearn NN +
# scipy entropy with explicit loops; VERDICT round 1 item 4)
# ---------------------------------------------------------------------------


def _jsd_oracle(sample_pcs, ref_pcs, resolution):
    """Straight transcription of latent_3d_points/PointFlow
    `jsd_between_point_cloud_sets` (in_unit_sphere=True): sphere-clipped
    [-0.5,0.5]^3 grid, per-point nearest-node counters via sklearn, base-2
    JS divergence via the entropy identity."""
    from scipy.stats import entropy
    from sklearn.neighbors import NearestNeighbors

    spacing = 1.0 / (resolution - 1)
    nodes = []
    for i in range(resolution):
        for j in range(resolution):
            for k in range(resolution):
                nodes.append([i * spacing - 0.5, j * spacing - 0.5, k * spacing - 0.5])
    nodes = np.array(nodes)
    nodes = nodes[np.linalg.norm(nodes, axis=1) <= 0.5]

    def counters(pcs):
        nn = NearestNeighbors(n_neighbors=1).fit(nodes)
        c = np.zeros(len(nodes))
        for pc in pcs:
            _, ind = nn.kneighbors(pc)
            for i in np.squeeze(ind):
                c[i] += 1
        return c

    P = counters(sample_pcs)
    Q = counters(ref_pcs)
    P = P / np.sum(P)
    Q = Q / np.sum(Q)
    return entropy((P + Q) / 2.0, base=2) - 0.5 * (entropy(P, base=2) + entropy(Q, base=2))


def test_jsd_matches_pointflow_oracle():
    rng = np.random.default_rng(7)
    # clouds inside the unit sphere (radius 0.5 frame), plus some points
    # outside to exercise the snap-to-edge path
    a = (rng.normal(size=(6, 128, 3)) * 0.2).astype(np.float32)
    b = (rng.normal(size=(6, 128, 3)) * 0.2 + 0.15).astype(np.float32)
    import warnings

    for res in (16, 28):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            got = jsd_between_sets(a, b, resolution=res, frame="raw")
        want = _jsd_oracle(a, b, res)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


def test_jsd_symmetric_and_bounded():
    rng = np.random.default_rng(8)
    a = (rng.normal(size=(4, 64, 3)) * 0.2).astype(np.float32)
    b = (rng.normal(size=(4, 64, 3)) * 0.2 + 0.3).astype(np.float32)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ab, ba = (jsd_between_sets(a, b, frame="raw"),
                  jsd_between_sets(b, a, frame="raw"))
    np.testing.assert_allclose(ab, ba, rtol=1e-9)
    assert 0.0 <= ab <= 1.0  # base-2 JSD is bounded by 1 bit


def test_jsd_fit_frame_on_per_shape_clouds():
    """VERDICT r2 Weak #1: with the shipped `normalize: per_shape` (max
    radius 1.0 — 2x the JSD grid), frame="fit" must (a) not warn, (b) equal
    the raw-frame JSD of the pre-shrunk clouds (pure reparameterization),
    and (c) keep resolution: distinct sets stay distinguishable."""
    import warnings

    rng = np.random.default_rng(11)

    def per_shape_cloud(shift):
        c = rng.normal(size=(96, 3)) + shift
        c = c - c.mean(0)
        return (c / np.abs(np.linalg.norm(c, axis=1)).max()).astype(np.float32)

    a = np.stack([per_shape_cloud(0.0) for _ in range(6)])
    b = np.stack([per_shape_cloud(np.array([2.0, 0, 0])) for _ in range(6)])
    assert np.linalg.norm(a.reshape(-1, 3), axis=1).max() > 0.9  # really per_shape scale

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning fails the test
        fit = jsd_between_sets(a, b, resolution=28)  # default frame="fit"
        same = jsd_between_sets(a, a, resolution=28)
    assert same < 1e-12
    assert fit > 0.0

    # fit == raw on the jointly pre-shrunk clouds
    r = max(np.linalg.norm(a.reshape(-1, 3), axis=1).max(),
            np.linalg.norm(b.reshape(-1, 3), axis=1).max())
    want = jsd_between_sets(a * (0.5 / r), b * (0.5 / r), resolution=28, frame="raw")
    np.testing.assert_allclose(fit, want, rtol=1e-9)

    with pytest.raises(ValueError):
        jsd_between_sets(a, b, frame="bogus")


# ---------------------------------------------------------------------------
# per-category decomposition (VERDICT round 1 item 4)
# ---------------------------------------------------------------------------


def test_per_category_mmd_cov_decomposes_global():
    from dpfx.metrics import per_category_mmd_cov

    rng = np.random.default_rng(3)
    m = rng.uniform(0.1, 1.0, size=(10, 9))
    labels = np.array([0] * 3 + [1] * 3 + [2] * 3)
    per = per_category_mmd_cov(m, labels)
    # per-class MMDs average (weighted by class size) to the global MMD
    sizes = np.array([3, 3, 3])
    glob = mmd_cov(m)
    np.testing.assert_allclose(
        sum(per[c]["mmd"] * s for c, s in zip((0, 1, 2), sizes)) / sizes.sum(),
        glob["mmd"],
    )
    np.testing.assert_allclose(
        sum(per[c]["cov"] * s for c, s in zip((0, 1, 2), sizes)) / sizes.sum(),
        glob["cov"],
    )


def test_compute_all_metrics_per_category_keys():
    k = jax.random.PRNGKey(4)
    gen = jax.random.normal(k, (8, 24, 3)) * 0.2
    ref = jax.random.normal(jax.random.fold_in(k, 1), (8, 24, 3)) * 0.2
    labels = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    out = compute_all_metrics(
        gen, ref, metrics=("cd",), impl="jnp",
        ref_labels=labels, label_names={0: "airplane", 1: "chair"},
    )
    per = out["per_category"]
    assert set(per) == {"airplane", "chair"}
    assert set(per["airplane"]) == {"mmd-cd", "cov-cd"}


def test_evaluate_reconstruction_per_category(tmp_path):
    from dpfx.metrics import evaluate_reconstruction
    from dpfx.models import DPF
    from tests.test_models import tiny_config

    cfg = tiny_config()
    model = DPF(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 32, 3))
    params = model.init(rng, x, rng)
    clouds = np.asarray(jax.random.normal(jax.random.fold_in(rng, 1), (8, 32, 3)))
    labels = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    out = evaluate_reconstruction(
        model, params, clouds, cfg, rng, impl="jnp",
        labels=labels, label_names={0: "airplane", 1: "chair"},
    )
    per = out["per_category"]
    assert set(per) == {"airplane", "chair"}
    # class means average back to the global mean
    np.testing.assert_allclose(
        (per["airplane"]["recon-cd"] + per["chair"]["recon-cd"]) / 2,
        out["recon-cd"], rtol=1e-6,
    )


# ---------------------------------------------------------------------------
# fast-vs-exact EMD at the METRIC level (VERDICT round 1 item 4: 1-NNA
# counts comparisons, so pair-level drift must be shown not to flip sets)
# ---------------------------------------------------------------------------


def test_fast_vs_exact_emd_metric_level():
    from dpfx.ops import emd_pairwise

    rng = np.random.default_rng(5)
    # realistic shape: two nearby-but-distinct distributions
    gen = jnp.asarray(rng.normal(size=(12, 64, 3)) * 0.3)
    ref = jnp.asarray(rng.normal(size=(12, 64, 3)) * 0.3 + 0.05)

    def suite(precision):
        m_gr = np.asarray(emd_pairwise(gen, ref, precision=precision))
        m_gg = np.asarray(emd_pairwise(gen, gen, precision=precision))
        m_rr = np.asarray(emd_pairwise(ref, ref, precision=precision))
        mc = mmd_cov(m_gr)
        return mc["mmd"], mc["cov"], one_nna(m_gg, m_gr, m_rr)

    mmd_f, cov_f, nna_f = suite("fast")
    mmd_e, cov_e, nna_e = suite("exact")
    # bound the metric-level effect of the bf16 w-cache fast mode
    assert abs(mmd_f - mmd_e) / mmd_e < 5e-3, (mmd_f, mmd_e)
    assert abs(cov_f - cov_e) <= 1 / 12 + 1e-9, (cov_f, cov_e)
    assert abs(nna_f - nna_e) <= 1 / 12 + 1e-9, (nna_f, nna_e)


def test_fast_vs_exact_cd_metric_level():
    """bf16 fast CD pairwise: bound the metric-level effect (mirrors the
    EMD fast-mode test; 1-NNA counts comparisons so pair drift must be
    shown not to flip sets)."""
    from dpfx.ops import chamfer_pairwise

    rng = np.random.default_rng(7)
    gen = jnp.asarray(rng.normal(size=(12, 64, 3)) * 0.3)
    ref = jnp.asarray(rng.normal(size=(12, 64, 3)) * 0.3 + 0.05)

    def suite(precision):
        m_gr = np.asarray(chamfer_pairwise(gen, ref, precision=precision))
        m_gg = np.asarray(chamfer_pairwise(gen, gen, precision=precision))
        m_rr = np.asarray(chamfer_pairwise(ref, ref, precision=precision))
        mc = mmd_cov(m_gr)
        return mc["mmd"], mc["cov"], one_nna(m_gg, m_gr, m_rr)

    mmd_f, cov_f, nna_f = suite("fast")
    mmd_e, cov_e, nna_e = suite("exact")
    assert abs(mmd_f - mmd_e) / mmd_e < 1e-2, (mmd_f, mmd_e)
    assert abs(cov_f - cov_e) <= 1 / 12 + 1e-9, (cov_f, cov_e)
    assert abs(nna_f - nna_e) <= 1 / 12 + 1e-9, (nna_f, nna_e)


def test_fast_cd_pairwise_close_to_exact():
    """Pair-level: fast mode within bf16 tolerance of exact."""
    from dpfx.ops import chamfer_pairwise

    rng = np.random.default_rng(3)
    xs = jnp.asarray(rng.normal(size=(6, 96, 3)))
    ys = jnp.asarray(rng.normal(size=(5, 80, 3)))  # uneven S and N!=M paths
    exact = np.asarray(chamfer_pairwise(xs, ys, precision="exact"))
    fast = np.asarray(chamfer_pairwise(xs, ys, precision="fast"))
    np.testing.assert_allclose(fast, exact, rtol=2e-2, atol=1e-3)
