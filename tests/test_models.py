"""Model-level tests: encoder permutation invariance (SURVEY.md §4),
ELBO shapes/finiteness, sampling path shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from dpfx.config import Config, config_from_dict
from dpfx.models import DPF, PointNetEncoder


def tiny_config(experiment="ae") -> Config:
    return config_from_dict(
        {
            "experiment": experiment,
            "model": {
                "dz": 16,
                "point_flow": {"n_layers": 4, "hidden": 32, "n_hidden": 2},
                "latent_flow": {"n_layers": 4, "hidden": 32, "n_hidden": 2},
                "encoder": {"point_widths": [32, 64], "head_widths": [32]},
                "image_encoder": {"widths": [8, 16], "blocks_per_stage": 1},
            },
        }
    )


def test_encoder_permutation_invariance():
    enc = PointNetEncoder(dz=8, point_widths=(16, 32), head_widths=(16,))
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 64, 3))
    params = enc.init(rng, x)
    mu1, lv1 = enc.apply(params, x)
    perm = jax.random.permutation(jax.random.PRNGKey(1), 64)
    mu2, lv2 = enc.apply(params, x[:, perm])
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv1), np.asarray(lv2), atol=1e-5)


def test_elbo_shapes_and_finiteness():
    cfg = tiny_config()
    model = DPF(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (3, 32, 3))
    params = model.init(rng, x, rng)
    neg_elbo = model.apply(params, x, rng)
    assert neg_elbo.shape == (3,)
    assert np.isfinite(np.asarray(neg_elbo)).all()

    terms = model.apply(params, x, rng, method=model.elbo_terms)
    assert terms["recon_ll"].shape == (3,)
    assert terms["z"].shape == (3, cfg.model.dz)


def test_sample_and_reconstruct_shapes():
    cfg = tiny_config()
    model = DPF(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 32, 3))
    params = model.init(rng, x, rng)

    clouds = model.apply(params, rng, 5, 17, method=model.sample)
    assert clouds.shape == (5, 17, 3)
    assert np.isfinite(np.asarray(clouds)).all()

    rec = model.apply(params, x, rng, method=model.reconstruct)
    assert rec.shape == x.shape


def test_svr_image_posterior():
    cfg = tiny_config("svr")
    model = DPF(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 32, 3))
    img = jax.random.normal(rng, (2, 16, 16, 3))
    params = model.init(rng, x, rng, img)
    neg_elbo = model.apply(params, x, rng, img)
    assert neg_elbo.shape == (2,)
    assert np.isfinite(np.asarray(neg_elbo)).all()


def test_config_yaml_roundtrip(tmp_path):
    import yaml

    from dpfx.config import load_config
    from dpfx.config.schema import config_to_dict

    cfg = tiny_config()
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(config_to_dict(cfg)))
    cfg2 = load_config(str(p))
    assert cfg2.model.dz == cfg.model.dz
    assert cfg2.model.point_flow.n_layers == 4

    cfg3 = load_config(str(p), overrides=["model.dz=24", "train.lr=0.002"])
    assert cfg3.model.dz == 24
    assert cfg3.train.lr == 0.002


def test_config_unknown_keys_warn_not_fail(tmp_path):
    import warnings

    import yaml

    from dpfx.config import load_config

    p = tmp_path / "ref.yaml"
    p.write_text(yaml.safe_dump({"experiment": "ae", "some_reference_key": 5}))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = load_config(str(p))
    assert cfg.extra["some_reference_key"] == 5
    assert any("unknown keys" in str(x.message) for x in w)
