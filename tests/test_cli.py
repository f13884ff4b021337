"""CLI surface tests: train.py -> evaluate.py -> generate.py round-trip on
the CPU-runnable smoke config (SURVEY.md §1 L6 — the reference's public
interface is `python <script>.py <config.yaml> [overrides]`)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs", "smoke_ae_synthetic.yaml")


def run_cli(script, *args, timeout=900):
    # generous: a cold CLI subprocess (imports + CPU compile) measures
    # ~400 s on this box when the machine is otherwise busy; 420 flaked
    env = os.environ.copy()
    env["JAX_PLATFORMS"] = "cpu"
    # single CPU device: the CLI smoke exercises the plain-jit path; the
    # 8-device sharded path is covered in-process by tests/test_train.py
    env["XLA_FLAGS"] = ""
    # this box's sitecustomize dials a TPU session in EVERY python process
    # when this var is set — pointless for a CPU subprocess and a measured
    # hang source (one 900s CLI-test timeout died inside that dial)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{script} failed rc={proc.returncode}\nstdout: {proc.stdout[-2000:]}"
        f"\nstderr: {proc.stderr[-2000:]}"
    )
    return proc.stdout


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    ck = tmp_path_factory.mktemp("cli_ck")
    out = run_cli(
        "train.py", CFG,
        f"train.ckpt_dir={ck}", "train.steps=6", "train.log_every=3",
        "train.ckpt_every=6", "train.eval_every=100",
        "data.n_points=64", "data.synthetic_size=32", "train.batch_size=8",
    )
    assert "step 6/6" in out
    return ck


def test_train_cli_writes_metrics_and_ckpt(trained_ckpt):
    mdir = os.path.join(trained_ckpt, "smoke_ae_synthetic")
    lines = [json.loads(l) for l in open(os.path.join(mdir, "metrics.jsonl"))]
    assert any(r["kind"] == "train" for r in lines)
    assert any(d.isdigit() for d in os.listdir(mdir)), "no checkpoint step dir"


def test_evaluate_cli(trained_ckpt):
    out = run_cli(
        "evaluate.py", CFG,
        f"train.ckpt_dir={trained_ckpt}",
        "data.n_points=64", "data.synthetic_size=32", "eval.batch_size=8",
        "--limit", "8",
    )
    rec = json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
    assert rec["step"] == 6 and np.isfinite(rec["recon-cd"])


def test_generate_cli(trained_ckpt, tmp_path):
    out_npy = tmp_path / "gen.npy"
    run_cli(
        "generate.py", CFG,
        f"train.ckpt_dir={trained_ckpt}",
        "data.n_points=64", "data.synthetic_size=32",
        "--n-clouds", "3", "--n-points", "17", "--out", str(out_npy),
    )
    a = np.load(out_npy)
    assert a.shape == (3, 17, 3) and np.isfinite(a).all()


def test_make_decoder_paths():
    """make_decoder fused vs XLA parity on CPU (interpret kernels)."""
    import jax
    import jax.numpy as jnp

    from dpfx.config import config_from_dict
    from dpfx.models import DPF
    from dpfx.sampling import make_decoder

    cfg = config_from_dict({
        "model": {"dz": 8,
                  "point_flow": {"n_layers": 4, "hidden": 16, "n_hidden": 2},
                  "latent_flow": {"n_layers": 2, "hidden": 16, "n_hidden": 2},
                  "encoder": {"point_widths": [16], "head_widths": [16]}},
    })
    model = DPF(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((2, 16, 3)), rng)
    z = jax.random.normal(rng, (4, 8))
    for fused in (True, False):
        dec = make_decoder(model, params, n_points=33, fused=fused)
        x = dec(z, rng)
        assert x.shape == (4, 33, 3) and bool(jnp.isfinite(x).all())


def test_train_cli_svr(tmp_path):
    """SVR experiment through the CLI (synthetic render pairs, mixer
    encoder for CPU speed): trains and writes a checkpoint."""
    out = run_cli(
        "train.py", os.path.join(REPO, "configs", "smoke_svr_synthetic.yaml"),
        f"train.ckpt_dir={tmp_path}", "train.steps=4", "train.log_every=2",
        "train.ckpt_every=4", "train.eval_every=100",
        "data.n_points=64", "data.synthetic_size=16", "train.batch_size=4",
    )
    assert "step 4/4" in out
    mdir = os.path.join(tmp_path, "smoke_svr_synthetic")
    assert any(d.isdigit() for d in os.listdir(mdir))
