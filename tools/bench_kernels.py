#!/usr/bin/env python
"""Kernel micro-benchmark suite (round-over-round regression guard beyond
bench.py's flagship numbers; VERDICT round-1 "single-flagship bench
protocol" item).

Times each native kernel (and its XLA twin where one exists) under the
chain-v2 protocol (one dispatched lax.scan, materializing warmup/close —
see bench.py docstring) and prints one JSON object. Run manually on the
chip; paste results into BASELINE.md per round:

  python tools/bench_kernels.py [reps]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def chain_time_ms(step_fn, carry, reps: int = REPS) -> float:
    from dpfx.utils.profiling import chain_time_ms as _impl

    return _impl(step_fn, carry, reps=reps)


def perturbed(x, c):
    """Hoist-proof input: adds a carry-dependent, numerically negligible
    term. The carry INCREMENTS each step (see bodies below), so the loop
    body can never be proven loop-invariant and hoisted out of the scan —
    `x + c * 0` would be one algebraic-simplifier fold away from timing an
    empty loop."""
    return x + c.astype(x.dtype) * 1e-30


def main() -> None:
    from dpfx.ops.chamfer import chamfer, chamfer_pairwise
    from dpfx.ops.emd import emd

    rng = jax.random.PRNGKey(0)
    res = {}

    # --- CD diagonal fwd+bwd, B=16 pairs, N=2048 ---
    x = jax.random.normal(rng, (16, 2048, 3))
    y = jax.random.normal(jax.random.fold_in(rng, 1), (16, 2048, 3))
    for impl in ("pallas", "jnp"):
        def fwd(c, i, impl=impl):
            d = chamfer(perturbed(x, c), y, impl=impl)
            return c + 1.0, jnp.sum(d)
        res[f"cd_fwd_b16_{impl}_ms"] = round(chain_time_ms(fwd, jnp.zeros(())), 3)

        g = jax.grad(lambda xx: jnp.sum(chamfer(xx, y, impl=impl)))
        def bwd(c, i, g=g):
            gx = g(perturbed(x, c))
            return c + 1.0, jnp.sum(gx)
        res[f"cd_fwdbwd_b16_{impl}_ms"] = round(chain_time_ms(bwd, jnp.zeros(())), 3)

    # --- CD pairwise 64x64, N=2048 ---
    xs = jax.random.normal(rng, (64, 2048, 3))
    ys = jax.random.normal(jax.random.fold_in(rng, 2), (64, 2048, 3))
    for impl in ("pallas", "jnp"):
        def pw(c, i, impl=impl):
            m = chamfer_pairwise(perturbed(xs, c), ys, impl=impl)
            return c + 1.0, jnp.sum(m)
        res[f"cd_pairwise_64x64_{impl}_ms"] = round(
            chain_time_ms(pw, jnp.zeros(()), reps=3), 2)

    # --- EMD per pair (B=16 diagonal), N=2048 ---
    def ef(c, i):
        d = emd(perturbed(x, c), y)
        return c + 1.0, jnp.sum(d)
    res["emd_fwd_b16_ms"] = round(chain_time_ms(ef, jnp.zeros(())), 3)

    # --- EMD pairwise 16x16, N=2048, fast vs exact ---
    from dpfx.ops.emd import emd_pairwise

    for precision in ("fast", "exact"):
        def ep(c, i, precision=precision):
            m = emd_pairwise(perturbed(xs[:16], c), ys[:16], precision=precision)
            return c + 1.0, jnp.sum(m)
        res[f"emd_pairwise_16x16_{precision}_ms"] = round(
            chain_time_ms(ep, jnp.zeros(()), reps=3), 2)

    # --- fused sampler kernel, B=256 N=2048 (matches bench.py flagship) ---
    from __graft_entry__ import _flagship_config
    from dpfx.models import DPF
    from dpfx.sampling import make_sampler

    cfg = _flagship_config()
    model = DPF(cfg)
    params = model.init(rng, jnp.zeros((2, 16, 3)), rng)
    sample = make_sampler(model, params, 256, 2048, fused=True)

    def samp(c, i):
        out = sample(jax.random.fold_in(rng, i + c.astype(jnp.int32)))
        return c + 0 * out[0, 0, 0].astype(jnp.int32), out[0, 0, 0]
    res["sample_fused_b256_ms"] = round(
        chain_time_ms(samp, jnp.zeros((), jnp.int32)), 2)

    res["reps"] = REPS
    res["protocol"] = "chain-v2"
    print(json.dumps(res))


if __name__ == "__main__":
    main()
