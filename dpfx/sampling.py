"""End-to-end jitted sampling (SURVEY.md §8 step 7 — the north-star
throughput path; BASELINE.json ">10x clouds/sec/chip").

Two paths behind one API:

  * fused (default) — latent-flow inverse in XLA (tiny), then the fused
    Pallas kernel (dpfx.ops.fused_sampler) applies all K point-flow
    couplings with the tile of points and every layer's weights resident in
    VMEM. HBM traffic collapses from ~13 GB of streamed activations per
    256x2048 batch to reading u / writing x (~12 MB): measured 42M pts/s
    vs 28M (XLA bf16) vs 18.5M (XLA f32) on the v5e chip.
  * XLA — `model.sample` traced as one program; used when the flow has
    actnorm (not yet in the fused kernel) or as a cross-check.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from dpfx.models import DPF
from dpfx.ops.fused_sampler import (
    fused_sample_points,
    stack_point_flow_params,
)
from dpfx.ops.chamfer import _round_up

try:  # public since jax 0.6; fall back for older trees
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def _make_latent_inverse(model: DPF, params):
    """Returns eps -> z through the latent prior flow.

    XLA is the default DESPITE being a 14-layer tiny-op soup: the fused
    latent kernel (dpfx.ops.fused_latent) measures a wash-to-small-loss in
    same-process A/Bs (B=1: 1.111 ms XLA vs 1.090 fused; B=64: 3.03 vs
    3.26; B=256: 8.61 vs 8.65 — round 3). XLA overlaps the soup into the
    big point-flow kernel's gaps, while the extra custom-call is a hard
    serialization point. DPFX_SAMPLE_FUSED_LATENT=1 enables the fused
    path for re-measurement on other hardware."""
    import os

    from dpfx.ops.fused_latent import (
        fused_latent_inverse,
        fused_latent_supported,
        stack_latent_params_jnp,
    )

    lf_cfg = model.config.model.latent_flow
    dz = model.config.model.dz
    if (os.environ.get("DPFX_SAMPLE_FUSED_LATENT") == "1"
            and fused_latent_supported(lf_cfg, dz)):
        stacked = jax.tree.map(
            jnp.asarray, stack_latent_params_jnp(params, lf_cfg.n_layers, dz))
        return lambda eps: fused_latent_inverse(params, eps, lf_cfg,
                                                stacked=stacked)

    def xla_inverse(eps):
        z, _ = model.apply(params, eps,
                           method=lambda m, e: m.latent_flow.inverse(e))
        return z

    return xla_inverse


def _fused_noise_and_inverse(sp, z, rng, n_clouds, n_points, tile, dtype,
                             activation="relu", temperature=1.0):
    """Base noise is drawn by the in-kernel TPU PRNG (Box-Muller over
    pltpu.prng_random_bits): generating the [B, N, 3]-shaped noise in XLA
    with a traced key measured ~540 ms/batch on this chip vs ~12 ms total
    with the in-kernel stream (the earlier XLA numbers were flattered by
    compile-time constant folding of python-int seeds)."""
    del n_clouds
    seed = jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max, jnp.int32)
    return fused_sample_points(sp, z, seed, n_points, tile=tile, dtype=dtype,
                               activation=activation,
                               noise_scale=float(temperature))


def make_sampler(
    model: DPF,
    params,
    n_clouds: int,
    n_points: int,
    fused: bool = True,
    mesh: Optional[Mesh] = None,
    axis_name: str = "data",
    temperature: float = 1.0,
    latent_temperature: float = 1.0,
) -> Callable:
    """Returns rng -> [n_clouds, n_points, 3], jitted with static shapes.

    With a multi-device ``mesh`` the cloud axis is sharded over it via
    shard_map: each device runs the full pipeline (latent inverse + fused
    point-flow inverse) on n_clouds/n_devices clouds with a per-device rng
    fold — eval-time generation uses every chip instead of one
    (SURVEY.md §2.2; VERDICT r2 Missing #6).

    ``temperature`` scales the point base noise (u = tau_p * N(0, I3));
    ``latent_temperature`` scales the latent base noise (eps = tau_z *
    N(0, I_dz)). Both default to 1.0 == the unmodified sampler. The
    round-5 v3 quality-lever sweep measures whether reduced-temperature
    sampling closes the residual 1-NNA gap (BASELINE.md)."""
    pf_cfg = model.config.model.point_flow
    if mesh is not None and mesh.devices.size > 1:
        return _make_sharded_sampler(
            model, params, n_clouds, n_points, fused, mesh, axis_name,
            temperature=temperature, latent_temperature=latent_temperature,
        )
    if fused and not pf_cfg.use_actnorm:
        sp = stack_point_flow_params(params, pf_cfg.scale_cap)
        dz = model.config.model.dz
        dtype = jnp.dtype(pf_cfg.compute_dtype)
        tile = min(2048, _round_up(n_points, 128))

        latent_inverse = _make_latent_inverse(model, params)

        def sample(rng):
            kz, ku = jax.random.split(rng)
            eps = jax.random.normal(kz, (n_clouds, dz))
            if latent_temperature != 1.0:
                eps = eps * latent_temperature
            z = latent_inverse(eps)
            return _fused_noise_and_inverse(sp, z, ku, n_clouds, n_points, tile,
                                            dtype, pf_cfg.activation,
                                            temperature=temperature)

        return jax.jit(sample)

    def sample_xla(rng):
        return model.apply(params, rng, n_clouds, n_points, temperature,
                           latent_temperature, method=model.sample)

    return jax.jit(sample_xla)


def _make_sharded_sampler(
    model: DPF, params, n_clouds: int, n_points: int, fused: bool,
    mesh: Mesh, axis_name: str,
    temperature: float = 1.0, latent_temperature: float = 1.0,
) -> Callable:
    """Cloud-axis-sharded sampler (one shard_map over the mesh)."""
    nd = mesh.devices.size
    if n_clouds % nd:
        raise ValueError(
            f"n_clouds={n_clouds} must be a multiple of the mesh size {nd}"
        )
    shard = n_clouds // nd
    pf_cfg = model.config.model.point_flow
    dz = model.config.model.dz

    if fused and not pf_cfg.use_actnorm:
        sp = stack_point_flow_params(params, pf_cfg.scale_cap)
        dtype = jnp.dtype(pf_cfg.compute_dtype)
        tile = min(2048, _round_up(n_points, 128))

        # params/sp enter via closure (shard_map treats jaxpr consts as
        # replicated): passing StackedFlowParams as an operand would trace
        # its static scale_cap leaf into an f32[] tracer, which the Pallas
        # kernel needs at python time
        latent_inverse = _make_latent_inverse(model, params)

        def per_device(rng):
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
            kz, ku = jax.random.split(rng)
            eps = jax.random.normal(kz, (shard, dz))
            if latent_temperature != 1.0:
                eps = eps * latent_temperature
            z = latent_inverse(eps)
            return _fused_noise_and_inverse(
                sp, z, ku, shard, n_points, tile, dtype, pf_cfg.activation,
                temperature=temperature,
            )

        fn = _shard_map(
            per_device, mesh=mesh,
            in_specs=(P(),), out_specs=P(axis_name),
            check_vma=False,  # pallas_call outputs carry no vma info
        )
        return jax.jit(fn)

    def per_device_xla(rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        return model.apply(params, rng, shard, n_points, temperature,
                           latent_temperature, method=model.sample)

    fn = _shard_map(
        per_device_xla, mesh=mesh, in_specs=(P(),), out_specs=P(axis_name),
        check_vma=False,
    )
    return jax.jit(fn)


def make_decoder(model: DPF, params, n_points: int, fused: bool = True) -> Callable:
    """Returns (z [B,dz], rng) -> [B, n_points, 3] (AE/SVR decode path)."""
    pf_cfg = model.config.model.point_flow
    if fused and not pf_cfg.use_actnorm:
        sp = stack_point_flow_params(params, pf_cfg.scale_cap)
        dtype = jnp.dtype(pf_cfg.compute_dtype)
        tile = min(2048, _round_up(n_points, 128))

        def decode(z, rng):
            return _fused_noise_and_inverse(
                sp, z, rng, z.shape[0], n_points, tile, dtype, pf_cfg.activation
            )

        return jax.jit(decode)

    def decode_xla(z, rng):
        return model.apply(params, z, rng, n_points, method=model.decode)

    return jax.jit(decode_xla)
