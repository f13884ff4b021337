"""End-to-end jitted sampling (SURVEY.md §8 step 7 — the north-star
throughput path; BASELINE.json ">10x clouds/sec/chip").

`z = latent_flow.inverse(eps)`, `x = point_flow.inverse(u; z)` compiled as
one XLA program: K tiny conditioner MLPs fused around the coupling
arithmetic, everything resident on device. The per-cloud z-projections of
each coupling layer are computed once and broadcast over the points axis
(see dpfx.models.coupling.Conditioner), so the dominant work is
[B*N, hidden] matmuls on the MXU.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax

from dpfx.models import DPF


def make_sampler(
    model: DPF, params, n_clouds: int, n_points: int, donate: bool = False
) -> Callable:
    """Returns rng -> [n_clouds, n_points, 3], jitted with static shapes."""

    def sample(rng):
        return model.apply(params, rng, n_clouds, n_points, method=model.sample)

    return jax.jit(sample)


def make_decoder(model: DPF, params, n_points: int) -> Callable:
    """Returns (z [B,dz], rng) -> [B, n_points, 3] (AE/SVR decode path)."""

    def decode(z, rng):
        return model.apply(params, z, rng, n_points, method=model.decode)

    return jax.jit(decode)
