"""A/B the fused sampler's clouds-per-grid-step knob (DPFX_SAMPLE_G).

G amortizes the fixed per-grid-step cost — the measured bound on the
sampler once weights are VMEM-resident (ROUND2/3 dual-issue probe) —
over G clouds per grid step. Results are bit-identical across G (the
noise stream is seeded by global cloud index; test-pinned on-chip), so
this is purely a schedule choice.

Usage: python tools/bench_sample_g.py
Env:   DPFX_GAB_B (256), DPFX_GAB_N (2048), DPFX_GAB_REPS (30),
       DPFX_GAB_GS ("1,2,4,8,16,32")
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    from dpfx.models import DPF
    from dpfx.ops.fused_sampler import fused_sample_points, stack_point_flow_params
    from dpfx.utils.profiling import chain_time_ms

    import bench as bench_mod

    cfg = bench_mod._flagship_cfg()
    b = int(os.environ.get("DPFX_GAB_B", "256"))
    n = int(os.environ.get("DPFX_GAB_N", "2048"))
    reps = int(os.environ.get("DPFX_GAB_REPS", "30"))
    gs = [int(g) for g in os.environ.get("DPFX_GAB_GS", "1,2,4,8,16,32").split(",")]

    model = DPF(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((2, 16, 3), jnp.float32), rng)
    pf = cfg.model.point_flow
    sp = stack_point_flow_params(params, pf.scale_cap)
    z = jax.random.normal(jax.random.PRNGKey(1), (b, cfg.model.dz))

    print(f"# sample-G A/B: B={b} N={n} reps={reps} "
          f"device={jax.devices()[0].device_kind}")
    print(f"{'G':>4} {'ms/call':>9} {'pts/s':>13}")
    for g in gs:
        fn = lambda seed: fused_sample_points(
            sp, z, seed, n, dtype=jnp.dtype(pf.compute_dtype),
            activation=pf.activation, clouds_per_step=g)

        def step(carry, i):
            out = fn(carry + i)
            return carry + 0 * out[0, 0, 0].astype(jnp.int32), out[0, 0, 0]

        dt = chain_time_ms(step, jnp.zeros((), jnp.int32), reps)
        print(f"{g:>4} {dt:>9.3f} {b * n / dt * 1000.0:>13.0f}", flush=True)


if __name__ == "__main__":
    main()
