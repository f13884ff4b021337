"""Tracing / profiling harness (SURVEY.md §5 tracing bullet: the reference
has none; the build ships a jax.profiler trace + block_until_ready timing
harness around the sampling path, the north-star throughput metric)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


def time_fn(
    fn: Callable,
    *args,
    reps: int = 10,
    warmup: int = 1,
    materialize: bool = False,
) -> Dict[str, float]:
    """Steady-state timing of a jitted fn. Chains `reps` dependent calls and
    blocks once (device-side pipelining preserved); ``materialize=True``
    instead fetches each result to host — use it on this box's tunneled TPU
    where per-call block_until_ready can return optimistically (see
    BASELINE.md note on ~20 ms dispatch overhead)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    if materialize:
        for _ in range(reps):
            np.asarray(jax.tree.leaves(fn(*args))[0])
    else:
        outs = [fn(*args) for _ in range(reps)]
        jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / reps
    return {"mean_s": dt, "per_sec": 1.0 / dt}


def chain_time_ms(step_fn: Callable, carry, reps: int = 30) -> float:
    """Honest steady-state ms/step on the tunneled TPU: ONE dispatched
    lax.scan of `reps` steps (carry serializes them on device), with BOTH
    the warmup and the timed run closed by materializing fetches.

    This is bench protocol chain-v2 (BASELINE.md): per-call async dispatch
    costs ~20 ms of host time through the tunnel, and block_until_ready on
    the warmup can return optimistically, leaking warmup execution into the
    timed region (up to 2x inflation) — both invalidated round-1 numbers.

    step_fn(carry, i) -> (carry, scalar).
    """
    import jax.numpy as jnp

    @jax.jit
    def run(c):
        return jax.lax.scan(step_fn, c, jnp.arange(reps))

    c, out = run(carry)
    float(np.asarray(out)[-1])
    t0 = time.perf_counter()
    c, out = run(c)
    closing = float(np.asarray(out)[-1])
    dt = (time.perf_counter() - t0) / reps * 1000.0
    assert np.isfinite(closing), "chain produced non-finite closing value"
    return dt


def chain_cost_per_step(step_fn: Callable, carry, reps: int = 30):
    """(flops, bytes_accessed) of ONE step of the chain-v2 scan body, from
    XLA's own cost analysis — the absolute denominator for MFU / bandwidth-
    utilization reporting (round-3 VERDICT: vs_baseline alone was
    self-referential). The step is compiled standalone rather than inside
    the scan: XLA's cost model counts a while-loop body ONCE regardless of
    trip count, so analyzing the chain and dividing by ``reps`` undercounts
    by ~reps (verified on CPU). ``reps`` is accepted for signature symmetry
    with chain_time_ms and ignored. Returns (None, None) when the backend
    exposes no cost model."""
    del reps
    import jax.numpy as jnp

    try:
        compiled = jax.jit(step_fn).lower(
            carry, jnp.zeros((), jnp.int32)).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = ca.get("flops")
        bytes_acc = ca.get("bytes accessed")
        return (flops or None, bytes_acc or None)
    except Exception:
        return None, None


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/dpfx_trace"):
    """jax.profiler trace context; view with tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def profile_sampling(cfg=None, n_clouds: int = 256, n_points: int = 2048,
                     trace_dir: Optional[str] = None) -> Dict[str, float]:
    """Timing (and optional trace) of the fused + XLA sampling paths."""
    import jax.numpy as jnp

    from dpfx.models import DPF
    from dpfx.sampling import make_sampler

    if cfg is None:
        from __graft_entry__ import _flagship_config

        cfg = _flagship_config()
    model = DPF(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((2, 16, 3)), rng)
    out = {}
    for name, fused in (("fused", True), ("xla", False)):
        fn = make_sampler(model, params, n_clouds, n_points, fused=fused)
        ctx = trace(trace_dir) if trace_dir else contextlib.nullcontext()
        with ctx:
            t = time_fn(fn, rng, reps=10)
        out[f"{name}_points_per_sec"] = n_clouds * n_points * t["per_sec"]
        out[f"{name}_ms"] = t["mean_s"] * 1e3
    return out
