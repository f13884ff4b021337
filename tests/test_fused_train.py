"""Fused fwd(+logdet) custom-VJP train-kernel tests (round-2 VERDICT item 1;
SURVEY.md §8 step 7). Interpret mode on CPU; the same kernels compile on the
chip (make test-tpu)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpfx.config import config_from_dict
from dpfx.models import DPF
from dpfx.ops.fused_train import (
    fused_point_flow_recon_ll,
    fused_train_supported,
)


def make_model(n_layers=5, n_hidden=2, n=200, b=4, seed=0):
    cfg = config_from_dict({
        "experiment": "ae",
        "model": {
            "dz": 16,
            "point_flow": {"n_layers": n_layers, "hidden": 32, "n_hidden": n_hidden},
            "latent_flow": {"n_layers": 4, "hidden": 32, "n_hidden": 2},
            "encoder": {"point_widths": [32, 64], "head_widths": [32]},
        },
    })
    model = DPF(cfg)
    rng = jax.random.PRNGKey(seed)
    x = jax.random.normal(rng, (b, n, 3))
    z = jax.random.normal(jax.random.fold_in(rng, 1), (b, 16))
    params = model.init(rng, x, rng)
    # perturb so s/t are nonzero (the out layers are zero-init)
    params = jax.tree.map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(2), a.shape),
        params,
    )
    return cfg, model, params, x, z


def ref_recon_ll(model, params, x, z):
    return model.apply(
        params, x, z, method=lambda m, a, b: m.point_flow.log_prob(a, b)
    ).sum(-1)


@pytest.mark.parametrize("n_layers,n_hidden,n", [(5, 2, 200), (4, 1, 256), (6, 3, 130)])
def test_fused_forward_matches_flax(n_layers, n_hidden, n):
    """Fused fwd == CouplingFlow.log_prob summed over points, including
    non-128-multiple N (padded-column validity masking)."""
    cfg, model, params, x, z = make_model(n_layers, n_hidden, n)
    a = ref_recon_ll(model, params, x, z)
    b = fused_point_flow_recon_ll(params, x, z, cfg.model.point_flow)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-3)


def test_fused_backward_matches_flax_grads():
    """Every cotangent — all flow weights, x, z — matches jax.grad through
    the flax path (the custom-VJP backward kernel end-to-end)."""
    cfg, model, params, x, z = make_model()
    fl = cfg.model.point_flow

    ga = jax.grad(lambda p: ref_recon_ll(model, p, x, z).sum())(params)
    gb = jax.grad(lambda p: fused_point_flow_recon_ll(p, x, z, fl).sum())(params)
    for (pa, va), (pb, vb) in zip(
        jax.tree_util.tree_flatten_with_path(ga)[0],
        jax.tree_util.tree_flatten_with_path(gb)[0],
    ):
        name = "/".join(str(getattr(q, "key", q)) for q in pa)
        np.testing.assert_allclose(
            np.asarray(vb), np.asarray(va), rtol=1e-3, atol=1e-3,
            err_msg=f"weight grad mismatch at {name}",
        )

    gxa = jax.grad(lambda xx: ref_recon_ll(model, params, xx, z).sum())(x)
    gxb = jax.grad(lambda xx: fused_point_flow_recon_ll(params, xx, z, fl).sum())(x)
    np.testing.assert_allclose(np.asarray(gxb), np.asarray(gxa), rtol=1e-4, atol=1e-4)

    gza = jax.grad(lambda zz: ref_recon_ll(model, params, x, zz).sum())(z)
    gzb = jax.grad(lambda zz: fused_point_flow_recon_ll(params, x, zz, fl).sum())(z)
    np.testing.assert_allclose(np.asarray(gzb), np.asarray(gza), rtol=1e-4, atol=1e-4)


def test_fused_elbo_loss_matches_standard():
    """elbo_loss(fused_point_flow=True) == the standard path (same rng
    stream: elbo_latent_terms draws z exactly like elbo_terms)."""
    from dpfx.train.loss import elbo_loss

    cfg, model, params, x, _ = make_model()
    rng = jax.random.PRNGKey(7)
    l0, m0 = elbo_loss(model, params, x, rng)
    l1, m1 = elbo_loss(model, params, x, rng, fused_point_flow=True)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    for k in m0:
        np.testing.assert_allclose(float(m1[k]), float(m0[k]), rtol=1e-4, atol=1e-5)


def test_fused_unsupported_falls_back_with_warning():
    cfg, model, params, x, _ = make_model()
    cfg.model.point_flow.activation = "gelu"
    model2 = DPF(cfg)
    from dpfx.train.loss import elbo_loss
    import dpfx.train.loss as loss_mod

    assert not fused_train_supported(cfg.model.point_flow)
    loss_mod._fused_warned.clear()
    with pytest.warns(UserWarning, match="outside the fused kernels"):
        l, _ = elbo_loss(model2, params, x, jax.random.PRNGKey(0),
                         fused_point_flow=True)
    assert np.isfinite(float(l))


def test_fused_train_step_matches_standard_single_device():
    """One full optimizer step, fused vs standard: same params update."""
    from dpfx.train import init_state, make_optimizer, make_train_step

    cfg, model, params, x, _ = make_model()
    cfg.train.fused_point_flow = False
    tx = make_optimizer(cfg.train)
    rng = jax.random.PRNGKey(0)
    s0 = init_state(model, cfg, rng, tx)
    s1 = jax.tree.map(jnp.copy, s0)

    step_std = make_train_step(model, tx, cfg, None)
    import copy

    cfg2 = copy.deepcopy(cfg)
    cfg2.train.fused_point_flow = True
    step_fused = make_train_step(model, tx, cfg2, None)

    s0, m0 = step_std(s0, {"x": x}, rng)
    s1, m1 = step_fused(s1, {"x": x}, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m0["grad_norm"]),
                               rtol=1e-3)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                   atol=1e-6)


def test_fused_train_step_sharded_matches_single():
    """The fused step under a multi-device mesh runs via shard_map with an
    explicit grad pmean — must equal the single-device fused step."""
    from dpfx.parallel import create_mesh
    from dpfx.train import init_state, make_optimizer, make_train_step

    cfg, model, params, x, _ = make_model(b=8, n=256)
    cfg.train.fused_point_flow = True
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


def test_fused_multi_step_sharded_matches_single():
    """steps_per_call>1 with the fused kernels on a mesh: the shard_map'd
    scan (eps drawn outside with global shapes) equals the single-device
    fused scan."""
    from dpfx.parallel import create_mesh
    from dpfx.train import init_state, make_optimizer
    from dpfx.train.trainer import make_multi_step

    cfg, model, params, x, _ = make_model(b=8, n=256)
    cfg.train.fused_point_flow = True
    tx = make_optimizer(cfg.train)
    rng = jax.random.PRNGKey(0)
    s0 = init_state(model, cfg, rng, tx)
    s1 = jax.tree.map(jnp.copy, s0)
    batches = {"x": jnp.stack([x + 0.01 * i for i in range(3)])}

    multi_single = make_multi_step(model, tx, cfg, None, steps_per_call=3)
    multi_mesh = make_multi_step(model, tx, cfg, create_mesh(), steps_per_call=3)
    s0, m0 = multi_single(s0, dict(batches), rng)
    s1, m1 = multi_mesh(s1, dict(batches), rng)
    np.testing.assert_allclose(np.asarray(m1["loss"]), np.asarray(m0["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                   atol=1e-6)


def test_fused_bf16_compute_dtype_close_to_flax():
    """The flagship trains with compute_dtype=bfloat16: the fused kernels
    must match the flax bf16 path to bf16-appropriate tolerance (both
    paths quantize matmul inputs to bf16; coupling math stays f32)."""
    cfg = config_from_dict({
        "experiment": "ae",
        "model": {
            "dz": 16,
            "point_flow": {"n_layers": 6, "hidden": 32, "n_hidden": 2,
                           "compute_dtype": "bfloat16"},
            "latent_flow": {"n_layers": 4, "hidden": 32, "n_hidden": 2},
            "encoder": {"point_widths": [32, 64], "head_widths": [32]},
        },
    })
    model = DPF(cfg)
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (4, 256, 3))
    z = jax.random.normal(jax.random.fold_in(rng, 1), (4, 16))
    params = model.init(rng, x, rng)
    params = jax.tree.map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(4), a.shape),
        params,
    )
    a = ref_recon_ll(model, params, x, z)
    b = fused_point_flow_recon_ll(params, x, z, cfg.model.point_flow)
    # bf16 matmuls: ~3 decimal digits; values are O(1e3)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-2)

    ga = jax.grad(lambda p: ref_recon_ll(model, p, x, z).sum())(params)
    gb = jax.grad(
        lambda p: fused_point_flow_recon_ll(p, x, z, cfg.model.point_flow).sum()
    )(params)
    for (pa, va), (_, vb) in zip(
        jax.tree_util.tree_flatten_with_path(ga)[0],
        jax.tree_util.tree_flatten_with_path(gb)[0],
    ):
        name = "/".join(str(getattr(q, "key", q)) for q in pa)
        na = float(jnp.linalg.norm(va))
        d = float(jnp.linalg.norm(va - vb))
        assert d <= 0.05 * na + 1e-2, f"bf16 grad drift at {name}: {d} vs norm {na}"


def test_fused_eval_step_sharded_matches_single():
    """make_eval_step with fused kernels on a mesh (shard_map + pmean +
    out-of-region eps) == the single-device fused eval."""
    from dpfx.parallel import create_mesh
    from dpfx.train import init_state, make_optimizer
    from dpfx.train.trainer import make_eval_step

    cfg, model, params, x, _ = make_model(b=8, n=256)
    cfg.train.fused_point_flow = True
    rng = jax.random.PRNGKey(0)
    state = init_state(model, cfg, rng, make_optimizer(cfg.train))

    ev1 = make_eval_step(model, cfg, None)
    ev8 = make_eval_step(model, cfg, create_mesh())
    m1 = ev1(state.params, {"x": x}, rng)
    m8 = ev8(state.params, {"x": x}, rng)
    for k in m1:
        np.testing.assert_allclose(float(m8[k]), float(m1[k]), rtol=1e-5,
                                   err_msg=f"metric {k}")


def test_bwd_rolled_matches_unrolled_bit_exact():
    """BWD_ROLLED (fori_loop layer walk, the on-chip default) produces
    bit-identical cotangents to the python-unrolled loop — same ops, same
    order, only the Mosaic stack layout differs."""
    import dpfx.ops.fused_train as F

    cfg, model, params, x, z = make_model(n_layers=5, n_hidden=2, n=256)

    def loss(p):
        return jnp.sum(fused_point_flow_recon_ll(p, x, z, cfg.model.point_flow))

    orig = F.BWD_ROLLED
    try:
        F.BWD_ROLLED = False
        ga = jax.grad(loss)(params)
        F.BWD_ROLLED = True
        gb = jax.grad(loss)(params)
    finally:
        F.BWD_ROLLED = orig
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
