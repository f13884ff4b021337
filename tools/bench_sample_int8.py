#!/usr/bin/env python
"""Same-run A/B of int8-dequant weights in the fused sample kernel — the
round-2 'remaining idea' for the latency-bound serial chain (BASELINE.md
round-2 campaign; round-4 VERDICT item 4).

Hypothesis check: the kernel keeps all weight stacks VMEM-resident across
grid steps, so int8 cannot reduce steady-state HBM traffic; any effect
comes from smaller VMEM residency (more pipeline headroom) vs the added
per-layer dequant (cast + scale on the weight matrix). The serial
matmul->VPU->matmul dependency chain is the measured bound, so the
expectation going in is NEUTRAL-TO-NEGATIVE; this tool records the number
either way, plus the quantization error.

Usage: python tools/bench_sample_int8.py  (on the TPU; chain-v2 protocol)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dpfx.config import config_from_dict
from dpfx.models import DPF
from dpfx.ops.fused_sampler import (
    fused_sample_points, quantize_flow_params, stack_point_flow_params,
)
from dpfx.utils.profiling import chain_time_ms

B, N, REPS = 256, 2048, 30


def main():
    cfg = config_from_dict({
        "experiment": "gen", "name": "int8ab",
        "model": {"dz": 128,
                  "point_flow": {"n_layers": 32, "hidden": 128, "n_hidden": 2,
                                 "compute_dtype": "bfloat16", "scale_cap": 3.0},
                  "latent_flow": {"n_layers": 14, "hidden": 256, "n_hidden": 2,
                                  "compute_dtype": "bfloat16", "scale_cap": 3.0},
                  "encoder": {"compute_dtype": "bfloat16"}},
    })
    model = DPF(cfg)
    rng = jax.random.PRNGKey(0)
    src = "init"
    ckpt = os.environ.get("DPFX_INT8_CKPT",
                          "configs/flagship_quality_v3_aug_100k.yaml")
    try:
        # parity is only meaningful on TRAINED weights: a fresh init
        # zero-inits each coupling's `out` layer (output independent of
        # wx/wh quantization — vacuous), and random weights make an
        # unstable flow whose chaotic amplification swamps the
        # quantization signal (measured rel_rms 1.0 at |x|~1e11)
        from dpfx.config import load_config
        from dpfx.train import restore_for_eval

        tcfg = load_config(ckpt)
        if tcfg.model.point_flow == cfg.model.point_flow:
            _, params, step = restore_for_eval(tcfg)
            src = f"{tcfg.name}@{step}"
        else:
            params = model.init(rng, jnp.zeros((2, 16, 3), jnp.float32), rng)
    except Exception:
        params = model.init(rng, jnp.zeros((2, 16, 3), jnp.float32), rng)
    sp = stack_point_flow_params(params, cfg.model.point_flow.scale_cap)
    qp = quantize_flow_params(sp)
    z = jax.random.normal(jax.random.fold_in(rng, 7), (B, cfg.model.dz))

    f_bf16 = jax.jit(lambda zz, s: fused_sample_points(sp, zz, s, N))
    f_int8 = jax.jit(
        lambda zz, s: fused_sample_points(sp, zz, s, N, quantized=qp))

    # parity first (same seed -> same noise stream -> direct comparison)
    x16 = np.asarray(f_bf16(z, jnp.int32(3)))
    x8 = np.asarray(f_int8(z, jnp.int32(3)))
    rms = float(np.sqrt(np.mean((x16 - x8) ** 2)))
    scale = float(np.sqrt(np.mean(x16 ** 2)))

    def step16(c, i):
        out = f_bf16(z, c)
        return c + 1 + 0 * out[0, 0, 0].astype(jnp.int32), out[0, 0, 0]

    def step8(c, i):
        out = f_int8(z, c)
        return c + 1 + 0 * out[0, 0, 0].astype(jnp.int32), out[0, 0, 0]

    t16 = chain_time_ms(step16, jnp.zeros((), jnp.int32), reps=REPS)
    t8 = chain_time_ms(step8, jnp.zeros((), jnp.int32), reps=REPS)
    print(json.dumps({
        "bf16_ms": round(t16, 3), "int8_ms": round(t8, 3),
        "speedup": round(t16 / t8, 4),
        "bf16_pts_per_s": round(B * N / t16 * 1000),
        "int8_pts_per_s": round(B * N / t8 * 1000),
        "quant_rms_error": rms, "coord_rms": scale,
        "rel_rms": round(rms / scale, 5),
        "protocol": "chain-v2", "shapes": [B, N, REPS],
        "weights": src,
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
