"""Serving-latency table for the flagship sampling path: per-request
latency and throughput vs batch size (production serving story —
SURVEY.md §3.2 is the paper's headline efficiency path).

Measures the fused Pallas sampler (and optionally the XLA path) at
several batch sizes under the chain-v2 protocol (dpfx.utils.profiling.
chain_time_ms: ONE dispatched scan, materializing fetches, per-step rng
folds so nothing hoists). Per-call latency through this box's tunnel
adds ~20 ms of host dispatch on top — the chain number is the on-chip
serving cost; a production host sees chip cost + its own (far smaller)
dispatch overhead.

Usage: python tools/bench_serving.py
Env:   DPFX_SERVE_BATCHES ("1,4,16,64,256,1024"), DPFX_SERVE_N (2048),
       DPFX_SERVE_REPS (30), DPFX_SERVE_XLA (0: also time the XLA path)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    from dpfx.models import DPF
    from dpfx.sampling import make_sampler
    from dpfx.utils.profiling import chain_time_ms

    import bench as bench_mod

    cfg = bench_mod._flagship_cfg()
    n = int(os.environ.get("DPFX_SERVE_N", "2048"))
    reps = int(os.environ.get("DPFX_SERVE_REPS", "30"))
    batches = [int(b) for b in
               os.environ.get("DPFX_SERVE_BATCHES", "1,4,16,64,256,1024").split(",")]
    paths = [("fused", True)]
    if os.environ.get("DPFX_SERVE_XLA") == "1":
        paths.append(("xla", False))

    model = DPF(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((2, 16, 3), jnp.float32), rng)

    print(f"# serving bench: N={n} reps={reps} device={jax.devices()[0].device_kind}")
    print(f"{'path':6} {'B':>5} {'ms/call':>9} {'clouds/s':>10} {'pts/s':>12}")
    for name, fused in paths:
        for b in batches:
            sample = make_sampler(model, params, b, n, fused=fused)

            def step(carry, i):
                key = jax.random.fold_in(rng, i + carry.astype(jnp.int32))
                out = sample(key)
                return carry + 0 * out[0, 0, 0].astype(jnp.int32), out[0, 0, 0]

            dt = chain_time_ms(step, jnp.zeros((), jnp.int32), reps)
            print(f"{name:6} {b:>5} {dt:>9.2f} {b / dt * 1000.0:>10.1f} "
                  f"{b * n / dt * 1000.0:>12.0f}", flush=True)


if __name__ == "__main__":
    main()
