#!/usr/bin/env python
"""Dual-issue probe (ROUND2_NOTES backlog 3 / round-2 VERDICT item 3).

Question: during a serial per-layer matmul chain (the fused sampler's
bound), can Mosaic overlap INDEPENDENT VPU work with the MXU waits? If
yes, cross-layer software pipelining of independent clouds could break the
serial-chain latency bound; if no, that idea is dead too.

Three kernels, same grid, chain-v2 timed:
  A: serial chain of L [H,H]@[H,T] matmuls (each depends on the last).
  B: the same chain + L INDEPENDENT elementwise VPU ops on a separate
     buffer (exp/mul chain with no data dependence on the matmuls).
  C: the VPU work alone.
If t(B) ~= t(A) (and both >> t(C)), the VPU work rode for free under the
MXU chain -> pipelining has headroom ~t(C). If t(B) ~= t(A)+t(C), Mosaic
serializes: dead end, record and stop.
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from dpfx.utils.profiling import chain_time_ms

import os
L = int(os.environ.get("PROBE_L", "32"))
G = int(os.environ.get("PROBE_G", "16"))  # grid steps per invocation: the
# first probe design used grid=(1,) and measured ~1.1 ms PER INVOCATION
# regardless of L (32 or 320!) — per-custom-call overhead swamps compute;
# amortize over G grid steps like the real sampler does
H, T = 128, 2048


def _kernel(w_ref, x_ref, v_ref, ox_ref, ov_ref, *, do_mxu: bool, do_vpu: bool):
    x = x_ref[0].astype(jnp.bfloat16)          # [H, T]
    v = v_ref[0]                                # [8, T] f32
    for i in range(L):
        if do_mxu:
            x = jax.lax.dot_general(
                w_ref[i], x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)              # serial dependency chain
        if do_vpu:
            # independent VPU chain (no dependence on x)
            v = jnp.exp(v * 0.25) - 1.0
    ox_ref[0] = x.astype(jnp.float32)
    ov_ref[0] = v


def build(do_mxu: bool, do_vpu: bool):
    w = jnp.asarray(np.random.default_rng(0).normal(size=(L, H, H)) * 0.05,
                    jnp.bfloat16)
    kernel = functools.partial(_kernel, do_mxu=do_mxu, do_vpu=do_vpu)

    @jax.jit
    def run(x, v):
        return pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((L, H, H), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H, T), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, T), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, H, T), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, T), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((G, H, T), jnp.float32),
                jax.ShapeDtypeStruct((G, 8, T), jnp.float32),
            ],
        )(w, x, v)

    return run


def main():
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(G, H, T)), jnp.float32)
    v0 = jnp.asarray(rng.normal(size=(G, 8, T)), jnp.float32)

    for name, mxu, vpu in [("A mxu-only", True, False),
                           ("B mxu+vpu", True, True),
                           ("C vpu-only", False, True)]:
        run = build(mxu, vpu)

        def step(carry, i):
            x, v = carry
            # perturb with the loop index so nothing hoists (chain-v2 rule)
            ox, ov = run(x * (1.0 + 1e-12 * i), v)
            return (ox, ov), ox[0, 0, 0]  # [G,...] carries through

        dt = chain_time_ms(lambda c, i: step(c, i), (x0, v0), reps=30)
        print(f"{name}: {dt:.3f} ms ({dt/(G*L)*1000:.2f} us/grid-layer)", flush=True)


if __name__ == "__main__":
    main()
