"""Coverage for the smaller surfaces: mixer image encoder, converter rules
files, fused sampler with deeper conditioners, viz export."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from dpfx.models import DPF
from dpfx.models.encoders import MixerImageEncoder
from tests.test_models import tiny_config


def test_mixer_encoder_shapes_and_grads():
    enc = MixerImageEncoder(dz=16, patch=4, width=64, depth=2)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (2, 16, 16, 3))
    params = enc.init(rng, img)
    mu, lv = enc.apply(params, img)
    assert mu.shape == (2, 16) and lv.shape == (2, 16)
    g = jax.grad(lambda p: jnp.sum(enc.apply(p, img)[0] ** 2))(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))

    with pytest.raises(ValueError):
        enc.apply(params, jax.random.normal(rng, (2, 15, 15, 3)))


def test_convert_rules_file(tmp_path):
    from dpfx.compat import convert_state_dict, load_rules_file

    rules_yaml = [
        {"pattern": r"^enc\.lin\.weight$", "path": r"encoder/point_0/kernel",
         "transform": "linear_w"},
        {"pattern": r"^enc\.lin\.bias$", "path": r"encoder/point_0/bias"},
        {"pattern": r"^buffers\..*$", "path": None},
    ]
    p = tmp_path / "rules.yaml"
    p.write_text(yaml.safe_dump(rules_yaml))
    rules = load_rules_file(str(p))

    sd = {
        "enc.lin.weight": np.ones((4, 3), np.float32),
        "enc.lin.bias": np.zeros((4,), np.float32),
        "buffers.mask": np.ones((3,), np.float32),
    }
    params = convert_state_dict(sd, rules)
    assert params["params"]["encoder"]["point_0"]["kernel"].shape == (3, 4)
    assert "buffers" not in params["params"]


def test_fused_sampler_deeper_conditioner():
    """n_hidden=3 -> two stacked hidden matmuls inside the kernel."""
    from dpfx.ops.fused_sampler import fused_point_flow_inverse, stack_point_flow_params

    from dpfx.config import config_from_dict

    cfg = config_from_dict(
        {
            "model": {
                "dz": 16,
                "point_flow": {"n_layers": 4, "hidden": 32, "n_hidden": 3},
                "latent_flow": {"n_layers": 4, "hidden": 32, "n_hidden": 2},
                "encoder": {"point_widths": [32], "head_widths": [32]},
            }
        }
    )
    assert cfg.model.point_flow.n_hidden == 3
    model = DPF(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((2, 16, 3)), rng)
    params = jax.tree.map(
        lambda p: p + 0.02 * jax.random.normal(jax.random.PRNGKey(1), p.shape), params
    )
    sp = stack_point_flow_params(params)
    assert sp.wh.shape[1] == 2
    u = jax.random.normal(rng, (2, 64, 3))
    z = jax.random.normal(jax.random.fold_in(rng, 1), (2, cfg.model.dz))
    x_ref, _ = model.apply(params, u, z, method=lambda m, a, b: m.point_flow.inverse(a, b))
    x_f = fused_point_flow_inverse(sp, u, z, tile=64, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref), rtol=1e-5, atol=1e-5)


def test_viz_montage(tmp_path):
    pytest.importorskip("PIL")
    from dpfx.utils import save_cloud_montage

    clouds = np.random.default_rng(0).normal(size=(3, 128, 3)).astype(np.float32)
    out = save_cloud_montage(clouds, str(tmp_path / "m.png"), views=2, tile=32)
    assert out is not None
    from PIL import Image

    im = Image.open(out)
    assert im.size == (64, 96)  # 2 views x 32px wide, 3 clouds x 32px tall


def test_chain_time_ms_protocol():
    """chain-v2 timing utility: runs the scan chain, returns finite ms."""
    import jax.numpy as jnp

    from dpfx.utils.profiling import chain_time_ms

    calls = []

    def step(c, i):
        calls.append(1)
        return c + 1.0, c

    t = chain_time_ms(step, jnp.zeros(()), reps=4)
    assert t > 0 and t < 10_000
