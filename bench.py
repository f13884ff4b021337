#!/usr/bin/env python
"""Driver benchmark: flagship sampling + training throughput on the chip
(BASELINE.json tracked metric: points/sec/chip, train + sample;
SURVEY.md §3.2 is the paper's headline-efficiency path).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Protocol v2 (round 2, BASELINE.md "bench protocol"): every timing is a
chained lax.scan of REPS steps in ONE dispatch — the carry serializes the
steps on device, the warmup AND the timed run are closed by materializing
fetches (np.asarray; block_until_ready can return optimistically through
this box's TPU tunnel and push warmup work into the timed region).
Protocol v1 (round 1) timed a python loop of async dispatches, which is
host-dispatch-bound at ~20 ms/call through the tunnel: it measured the
tunnel, not the chip.

vs_baseline: the reference implementation's own numbers are not capturable
offline (empty mount, SURVEY.md §0), so the baseline is the round-1
STARTING-POINT configuration — XLA-only f32/gelu sampling path and f32/gelu
train step — measured LIVE under the identical v2 protocol each run. That
keeps the ratio an honest same-chip, same-protocol speedup of the current
design over the naive port. If the live baseline fails to build, the
pinned v1-protocol values are used and "baseline": "pinned-v1" is set.
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# v1-protocol pins (round 1), kept as fallback + cross-walk (BASELINE.md):
PINNED_V1_SAMPLE = 18_513_899.0  # f32 XLA sampler, async-loop protocol
PINNED_V1_TRAIN = 4_282_298.0    # first honest device-side train chain

B, N = 256, 2048
TRAIN_B, TRAIN_N = 64, 2048
SAMPLE_REPS = 30
TRAIN_REPS = 20


def chain_time_ms(step_fn, carry, reps: int) -> float:
    from dpfx.utils.profiling import chain_time_ms as _impl

    return _impl(step_fn, carry, reps=reps)


def _flagship_cfg():
    from __graft_entry__ import _flagship_config

    return _flagship_config()


def _baseline_cfg():
    """Round-1 starting point: f32 everywhere, gelu conditioners."""
    from dpfx.config import config_from_dict

    return config_from_dict(
        {
            "experiment": "ae",
            "name": "bench-baseline",
            "model": {
                "dz": 128,
                "point_flow": {"n_layers": 32, "hidden": 128, "n_hidden": 2,
                               "compute_dtype": "float32", "activation": "gelu"},
                "latent_flow": {"n_layers": 14, "hidden": 256, "n_hidden": 2,
                                "compute_dtype": "float32", "activation": "gelu"},
                "encoder": {"activation": "gelu"},
            },
        }
    )


def bench_sample(cfg, fused: bool, with_cost: bool = False):
    """Full sampling pipeline points/s/chip (latent inverse + point-flow
    inverse + noise), keys chained through the carry. ``with_cost=True``
    additionally returns the per-call (flops, hbm_floor_bytes) so the
    sample number self-interprets against chip peaks like the train side
    (round-4 VERDICT item 4)."""
    from dpfx.models import DPF
    from dpfx.sampling import make_sampler

    model = DPF(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((2, 16, 3), jnp.float32), rng)
    sample = make_sampler(model, params, B, N, fused=fused)

    def step(carry, i):
        key = jax.random.fold_in(rng, i + carry.astype(jnp.int32))
        out = sample(key)
        return carry + 0 * out[0, 0, 0].astype(jnp.int32), out[0, 0, 0]

    dt = chain_time_ms(step, jnp.zeros((), jnp.int32), SAMPLE_REPS)
    pts = B * N / dt * 1000.0
    if not with_cost:
        return pts
    # model flops via XLA cost analysis of the mathematically-identical
    # NON-fused sampler (Pallas custom calls report 0 flops to XLA)
    from dpfx.utils.profiling import chain_cost_per_step

    sample_xla = make_sampler(model, params, B, N, fused=False)

    def step_xla(carry, i):
        key = jax.random.fold_in(rng, i + carry.astype(jnp.int32))
        out = sample_xla(key)
        return carry + 0 * out[0, 0, 0].astype(jnp.int32), out[0, 0, 0]

    flops, _ = chain_cost_per_step(step_xla, jnp.zeros((), jnp.int32))
    # HBM traffic FLOOR, analytic (same convention as the train side):
    # inference reads each weight at least once per call and writes the
    # [B, N, 3] f32 output; noise is drawn in-kernel (no HBM stream) and
    # activations live in VMEM on the fused path. Weights stream at the
    # conditioner compute dtype (bf16 on the flagship).
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    wbytes = jnp.dtype(cfg.model.point_flow.compute_dtype).itemsize
    hbm_floor = n_params * wbytes + B * N * 3 * 4
    return pts, dt, flops, hbm_floor


def bench_train(cfg, with_cost: bool = False):
    """Flagship train-step throughput (points/s/chip), device-side chain.
    ``with_cost=True`` additionally returns the XLA-reported per-step
    (flops, bytes) for MFU / HBM-utilization reporting."""
    from dpfx.models import DPF
    from dpfx.train import init_state, make_optimizer, make_train_step

    model = DPF(cfg)
    rng = jax.random.PRNGKey(0)
    tx = make_optimizer(cfg.train)
    state = init_state(model, cfg, rng, tx)
    step = make_train_step(model, tx, cfg, mesh=None, jit=False)
    x = jax.random.normal(rng, (TRAIN_B, TRAIN_N, 3), jnp.float32)

    def body(st, i):
        st, m = step(st, {"x": x}, jax.random.fold_in(rng, i))
        return st, m["loss"]

    dt = chain_time_ms(body, state, TRAIN_REPS)
    pts = TRAIN_B * TRAIN_N / dt * 1000.0
    if not with_cost:
        return pts
    # model flops from the mathematically-identical XLA step: Pallas
    # custom calls report 0 flops to XLA's cost model, so analyzing the
    # fused step would undercount the model math the MFU is about
    import copy

    from dpfx.utils.profiling import chain_cost_per_step

    cfg_xla = copy.deepcopy(cfg)
    cfg_xla.train.fused_point_flow = False
    cfg_xla.train.fused_encoder = False
    cfg_xla.train.fused_latent_flow = False
    step_xla = make_train_step(model, tx, cfg_xla, mesh=None, jit=False)

    def body_xla(st, i):
        st, m = step_xla(st, {"x": x}, jax.random.fold_in(rng, i))
        return st, m["loss"]

    flops, _ = chain_cost_per_step(body_xla, state)
    # HBM traffic FLOOR, analytic: XLA's "bytes accessed" is pre-fusion
    # logical traffic (it measured 31 GB/step = 329% of HBM peak — useless).
    # Real steady-state traffic is dominated by parameter/optimizer streams:
    # params read twice (fwd+bwd) + written once, two Adam moments each
    # read+written, plus the input batch; activations stay in VMEM on the
    # fused path.
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(state.params))
    hbm_floor = n_params * 4 * (3 + 4) + TRAIN_B * TRAIN_N * 3 * 4
    return pts, dt, flops, hbm_floor


# Baseline cache: the live baseline costs ~4 extra compiles (~5 min of
# driver budget) per run; once measured on this chip it is cached and
# reused (cross-session chip variance is ±20% — the cache records its
# measurement date for honesty). Force a re-measure with
# DPFX_BENCH_REBASELINE=1.
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_BASELINE_CACHE.json")


def _cache_key() -> dict:
    """The cached baseline is only valid for the same HOST+chip and bench
    shapes — another machine (±20% cross-chip variance) or edited constants
    must re-measure. ``host`` keys out other boxes with the same
    device_kind (machine-id is per-VM unique; hostname on these boxes is a
    generic "vm"). If the chip behind the same VM's tunnel is ever swapped,
    the recorded date + DPFX_BENCH_REBASELINE=1 are the escape hatch."""
    import socket

    try:
        with open("/etc/machine-id") as f:
            host = f.read().strip()
    except OSError:
        host = socket.gethostname()
    return {
        "protocol": "chain-v2",
        "host": host,
        "device_kind": jax.devices()[0].device_kind,
        "shapes": [B, N, TRAIN_B, TRAIN_N, SAMPLE_REPS, TRAIN_REPS],
    }


def _load_baseline_cache():
    if os.environ.get("DPFX_BENCH_REBASELINE"):
        return None
    try:
        with open(BASELINE_CACHE) as f:
            c = json.load(f)
        key = _cache_key()
        if all(c.get(k) == v for k, v in key.items()):
            return c
    except (OSError, ValueError):
        pass
    return None


# absolute denominators (round-3 VERDICT item 4: vs_baseline alone is
# self-referential). Peaks per device kind; bf16 MXU + HBM streams.
PEAKS = {
    # v5e: 197 TFLOP/s bf16, ~819 GB/s HBM (public TPU v5e specs)
    "TPU v5 lite": (197e12, 819e9),
    "TPU v5e": (197e12, 819e9),
}


def main() -> None:
    flagship = _flagship_cfg()
    sample_pts, sample_ms, sample_flops, sample_bytes = bench_sample(
        flagship, fused=True, with_cost=True)
    train_pts, train_ms, train_flops, train_bytes = bench_train(
        flagship, with_cost=True)

    cached = _load_baseline_cache()
    if cached is not None:
        baseline_kind = f"cached-v2 ({cached.get('date', 'undated')})"
        sample_base = cached["sample_baseline_value"]
        train_base = cached["train_baseline_value"]
    else:
        baseline_kind = "live-v2"
        try:
            base = _baseline_cfg()
            sample_base = bench_sample(base, fused=False)
            train_base = bench_train(base)
            with open(BASELINE_CACHE, "w") as f:
                json.dump({
                    **_cache_key(),
                    "date": datetime.date.today().isoformat(),
                    "sample_baseline_value": sample_base,
                    "train_baseline_value": train_base,
                }, f)
        except Exception as e:  # fall back to the v1 pins, flagged
            print(f"[bench] live baseline failed ({e!r}); using pinned v1",
                  file=sys.stderr)
            baseline_kind = "pinned-v1"
            sample_base, train_base = PINNED_V1_SAMPLE, PINNED_V1_TRAIN

    peak_flops, peak_bw = PEAKS.get(
        jax.devices()[0].device_kind, (None, None))
    mfu = (round(train_flops / (train_ms / 1e3) / peak_flops, 4)
           if train_flops and peak_flops else None)
    hbm = (round(train_bytes / (train_ms / 1e3) / peak_bw, 4)
           if train_bytes and peak_bw else None)
    sample_mfu = (round(sample_flops / (sample_ms / 1e3) / peak_flops, 4)
                  if sample_flops and peak_flops else None)
    sample_hbm = (round(sample_bytes / (sample_ms / 1e3) / peak_bw, 4)
                  if sample_bytes and peak_bw else None)

    print(json.dumps({
        "metric": "sample_points_per_sec_per_chip",
        "value": round(sample_pts),
        "unit": "points/s",
        "vs_baseline": round(sample_pts / sample_base, 3),
        # sampler physics (round-4 VERDICT item 4): same method as the
        # train side — XLA flops of the identical non-fused sampler, and
        # an analytic weights+output HBM floor
        "sample_ms_per_call": round(sample_ms, 3),
        "sample_flops_per_call": round(sample_flops) if sample_flops else None,
        "sample_flops_per_cloud": (round(sample_flops / B)
                                   if sample_flops else None),
        "sample_mfu": sample_mfu,
        "sample_hbm_bytes_floor_per_call": (round(sample_bytes)
                                            if sample_bytes else None),
        "sample_hbm_bw_util_floor": sample_hbm,
        "train_points_per_sec_per_chip": round(train_pts),
        "train_vs_baseline": round(train_pts / train_base, 3),
        # absolute physics: XLA-reported cost of the train chain vs chip
        # peaks — lets the number self-interpret without the baseline
        "train_ms_per_step": round(train_ms, 3),
        "model_flops_per_step": round(train_flops) if train_flops else None,
        "mfu": mfu,
        "hbm_bytes_floor_per_step": round(train_bytes) if train_bytes else None,
        "hbm_bw_util_floor": hbm,
        # flops: XLA cost analysis of the mathematically-identical
        # non-fused step (Pallas calls report 0 flops). hbm floor:
        # analytic param/optimizer streams (XLA's pre-fusion "bytes
        # accessed" is not a traffic measure). A low floor + modest MFU
        # says the step is latency-bound on the serial layer chain, not
        # bandwidth-bound (BASELINE.md round-3 decomposition).
        "cost_source": "xla_flops+analytic_hbm_floor",
        "protocol": "chain-v2",
        "baseline": baseline_kind,
        "sample_baseline_value": round(sample_base),
        "train_baseline_value": round(train_base),
    }))


if __name__ == "__main__":
    main()
