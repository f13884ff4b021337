"""Train-step throughput vs batch size (round-3 VERDICT item 4: B=64 at
~42% MFU likely leaves device throughput on the table; the serving sweep
already showed batch scaling helps the sampler).

Same-run A/B (verify-skill rule: this chip drifts ~20% between sessions),
chain-v2 protocol, flagship model. Prints one markdown table row per batch
size with ms/step, points/s, and MFU from the XLA-equivalent step's flops.

Usage: python tools/bench_batch_sweep.py [--batches 64,128,256] [--reps 20]
"""

from __future__ import annotations

import argparse
import copy
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dpfx.utils.profiling import chain_cost_per_step, chain_time_ms  # noqa: E402

N = 2048
V5E_BF16_PEAK = 197e12


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", default="64,128,256")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args(argv)

    from __graft_entry__ import _flagship_config
    from dpfx.models import DPF
    from dpfx.train import init_state, make_optimizer, make_train_step

    cfg = _flagship_config()
    model = DPF(cfg)
    rng = jax.random.PRNGKey(0)
    tx = make_optimizer(cfg.train)
    state = init_state(model, cfg, rng, tx)
    step = make_train_step(model, tx, cfg, mesh=None, jit=False)
    cfg_xla = copy.deepcopy(cfg)
    cfg_xla.train.fused_point_flow = False
    cfg_xla.train.fused_encoder = False
    step_xla = make_train_step(model, tx, cfg_xla, mesh=None, jit=False)

    print("| B | ms/step | pts/s | MFU |")
    print("|---|---|---|---|")
    for b in [int(s) for s in args.batches.split(",")]:
        x = jax.random.normal(rng, (b, N, 3), jnp.float32)

        def body(st, i):
            st, m = step(st, {"x": x}, jax.random.fold_in(rng, i))
            return st, m["loss"]

        def body_xla(st, i):
            st, m = step_xla(st, {"x": x}, jax.random.fold_in(rng, i))
            return st, m["loss"]

        dt = chain_time_ms(body, state, args.reps)
        flops, _ = chain_cost_per_step(body_xla, state)
        mfu = flops / (dt / 1e3) / V5E_BF16_PEAK if flops else float("nan")
        print(f"| {b} | {dt:.2f} | {b * N / dt * 1000:,.0f} | {mfu:.1%} |",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
