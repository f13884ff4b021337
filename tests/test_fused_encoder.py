"""Fused PointNet-encoder kernel tests (round-3 continuation of the
fused-train work; SURVEY.md §2 C5). Interpret mode on CPU; the same kernels
compile on the chip (make test-tpu)."""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpfx.config import config_from_dict
from dpfx.models import DPF
from dpfx.ops.fused_encoder import (
    fused_encoder_supported,
    fused_pointnet_posterior,
)


def make_model(point_widths=(32, 64), head_widths=(32,), n=200, b=4, seed=0,
               compute_dtype="float32"):
    cfg = config_from_dict({
        "experiment": "ae",
        "model": {
            "dz": 16,
            "point_flow": {"n_layers": 4, "hidden": 32, "n_hidden": 2},
            "latent_flow": {"n_layers": 4, "hidden": 32, "n_hidden": 2},
            "encoder": {
                "point_widths": list(point_widths),
                "head_widths": list(head_widths),
                "compute_dtype": compute_dtype,
            },
        },
    })
    model = DPF(cfg)
    rng = jax.random.PRNGKey(seed)
    x = jax.random.normal(rng, (b, n, 3))
    params = model.init(rng, x, rng)
    params = jax.tree.map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(2), a.shape),
        params,
    )
    return cfg, model, params, x


def ref_posterior(model, params, x):
    return model.apply(params, x, method=lambda m, a: m.encoder(a))


@pytest.mark.parametrize(
    "point_widths,head_widths,n",
    [((32, 64), (32,), 200), ((32, 32, 64, 128), (64, 32), 256),
     ((16, 128), (32,), 130)],
)
def test_fused_posterior_matches_flax(point_widths, head_widths, n):
    """(mu, logvar) through the fused pooled-feature kernel == the flax
    PointNetEncoder, including non-128-multiple N (padded-column mask)."""
    cfg, model, params, x = make_model(point_widths, head_widths, n)
    mu_a, lv_a = ref_posterior(model, params, x)
    mu_b, lv_b = fused_pointnet_posterior(params, x, cfg.model.encoder,
                                          cfg.model.dz)
    np.testing.assert_allclose(np.asarray(mu_b), np.asarray(mu_a),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv_b), np.asarray(lv_a),
                               rtol=1e-5, atol=1e-5)


def test_fused_posterior_grads_match_flax():
    """Cotangents for every encoder weight and for x match jax.grad through
    the flax path (recompute backward + max-mask reconstruction)."""
    cfg, model, params, x = make_model()

    def scal(post):
        mu, lv = post
        return jnp.sum(jnp.sin(mu)) + jnp.sum(jnp.cos(lv))

    ga = jax.grad(lambda p: scal(ref_posterior(model, p, x)))(params)
    gb = jax.grad(lambda p: scal(fused_pointnet_posterior(
        p, x, cfg.model.encoder, cfg.model.dz)))(params)
    for (pa, va), (_, vb) in zip(
        jax.tree_util.tree_flatten_with_path(ga)[0],
        jax.tree_util.tree_flatten_with_path(gb)[0],
    ):
        name = "/".join(str(getattr(q, "key", q)) for q in pa)
        np.testing.assert_allclose(
            np.asarray(vb), np.asarray(va), rtol=1e-4, atol=1e-5,
            err_msg=f"grad mismatch at {name}",
        )

    gxa = jax.grad(lambda xx: scal(ref_posterior(model, params, xx)))(x)
    gxb = jax.grad(lambda xx: scal(fused_pointnet_posterior(
        params, xx, cfg.model.encoder, cfg.model.dz)))(x)
    np.testing.assert_allclose(np.asarray(gxb), np.asarray(gxa),
                               rtol=1e-4, atol=1e-5)


def test_fused_posterior_max_tie_split_matches_flax():
    """Duplicate points force exact max-pool ties; the kernel's even-split
    cotangent (mask/count) must equal jnp.max's VJP."""
    cfg, model, params, x = make_model(n=64)
    # make points 0..7 identical within each cloud -> guaranteed feature ties
    x = x.at[:, 1:8].set(x[:, :1])

    def scal(xx):
        mu, lv = fused_pointnet_posterior(params, xx, cfg.model.encoder,
                                          cfg.model.dz)
        return jnp.sum(mu * mu) + jnp.sum(lv)

    def scal_ref(xx):
        mu, lv = ref_posterior(model, params, xx)
        return jnp.sum(mu * mu) + jnp.sum(lv)

    gxa = jax.grad(scal_ref)(x)
    gxb = jax.grad(scal)(x)
    np.testing.assert_allclose(np.asarray(gxb), np.asarray(gxa),
                               rtol=1e-4, atol=1e-5)


def test_fused_posterior_bf16_close_to_flax():
    cfg, model, params, x = make_model(compute_dtype="bfloat16", n=256)
    mu_a, lv_a = ref_posterior(model, params, x)
    mu_b, lv_b = fused_pointnet_posterior(params, x, cfg.model.encoder,
                                          cfg.model.dz)
    np.testing.assert_allclose(np.asarray(mu_b), np.asarray(mu_a),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(lv_b), np.asarray(lv_a),
                               rtol=0.05, atol=0.05)


def test_fused_encoder_elbo_loss_matches_standard():
    """elbo_loss(fused_encoder=True) == the standard path — loss, metrics,
    and parameter gradients (same rng stream)."""
    from dpfx.train.loss import elbo_loss

    cfg, model, params, x = make_model()
    rng = jax.random.PRNGKey(7)
    l0, m0 = elbo_loss(model, params, x, rng)
    l1, m1 = elbo_loss(model, params, x, rng, fused_encoder=True)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    for k in m0:
        np.testing.assert_allclose(float(m1[k]), float(m0[k]), rtol=1e-4,
                                   atol=1e-5)

    g0 = jax.grad(lambda p: elbo_loss(model, p, x, rng)[0])(params)
    g1 = jax.grad(
        lambda p: elbo_loss(model, p, x, rng, fused_encoder=True)[0])(params)
    for (pa, va), (_, vb) in zip(
        jax.tree_util.tree_flatten_with_path(g0)[0],
        jax.tree_util.tree_flatten_with_path(g1)[0],
    ):
        name = "/".join(str(getattr(q, "key", q)) for q in pa)
        np.testing.assert_allclose(
            np.asarray(vb), np.asarray(va), rtol=1e-4, atol=1e-5,
            err_msg=f"grad mismatch at {name}",
        )


def test_fused_encoder_with_fused_point_flow_matches_standard():
    """Both fused kernels on at once (the flagship train config)."""
    from dpfx.train.loss import elbo_loss

    cfg, model, params, x = make_model()
    rng = jax.random.PRNGKey(9)
    l0, _ = elbo_loss(model, params, x, rng)
    l1, _ = elbo_loss(model, params, x, rng, fused_encoder=True,
                      fused_point_flow=True)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)


def test_fused_encoder_unsupported_falls_back_with_warning():
    from dpfx.train.loss import elbo_loss
    import dpfx.train.loss as loss_mod

    cfg, model, params, x = make_model()
    cfg.model.encoder.activation = "gelu"
    model2 = DPF(cfg)
    assert not fused_encoder_supported(cfg.model.encoder, x.shape[-2])
    loss_mod._fused_warned.clear()
    with pytest.warns(UserWarning, match="outside the fused kernel"):
        l, _ = elbo_loss(model2, params, x, jax.random.PRNGKey(0),
                         fused_encoder=True)
    assert np.isfinite(float(l))


def test_fused_encoder_train_step_matches_standard_single_device():
    from dpfx.train import init_state, make_optimizer, make_train_step

    cfg, model, params, x = make_model()
    cfg.train.fused_encoder = False
    tx = make_optimizer(cfg.train)
    rng = jax.random.PRNGKey(0)
    s0 = init_state(model, cfg, rng, tx)
    s1 = jax.tree.map(jnp.copy, s0)

    step_std = make_train_step(model, tx, cfg, None)
    cfg2 = copy.deepcopy(cfg)
    cfg2.train.fused_encoder = True
    step_fused = make_train_step(model, tx, cfg2, None)

    s0, m0 = step_std(s0, {"x": x}, rng)
    s1, m1 = step_fused(s1, {"x": x}, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                   atol=1e-6)


def test_fused_encoder_train_step_sharded_matches_single():
    """fused_encoder alone (no fused point flow) must also take the
    shard_map path on a mesh — pallas doesn't partition under pjit — and
    match the single-device step exactly."""
    from dpfx.parallel import create_mesh
    from dpfx.train import init_state, make_optimizer, make_train_step

    cfg, model, params, x = make_model(b=8, n=256)
    cfg.train.fused_encoder = True
    tx = make_optimizer(cfg.train)
    rng = jax.random.PRNGKey(0)
    s0 = init_state(model, cfg, rng, tx)
    s1 = jax.tree.map(jnp.copy, s0)

    step_single = make_train_step(model, tx, cfg, None)
    step_mesh = make_train_step(model, tx, cfg, create_mesh())
    s0, m0 = step_single(s0, {"x": x}, rng)
    s1, m1 = step_mesh(s1, {"x": x}, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                   atol=1e-6)
