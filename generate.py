#!/usr/bin/env python
"""Sample point clouds from a trained model (SURVEY.md §3.2 — the
speed-claim path: closed-form inverse flow, no ODE solver).

Usage:
    python generate.py configs/<exp>.yaml [key=value ...] \
        [--n-clouds 64] [--n-points 2048] [--out samples.npy] [--step N]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("overrides", nargs="*")
    ap.add_argument("--n-clouds", type=int, default=64)
    ap.add_argument("--n-points", type=int, default=None)
    ap.add_argument("--out", default="samples.npy")
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--png", default=None, help="also save a render montage PNG")
    ap.add_argument("--temperature", type=float, default=None,
                    help="point base-noise scale (default: eval.temperature)")
    ap.add_argument("--latent-temperature", type=float, default=None,
                    help="latent base-noise scale (default: eval.latent_temperature)")
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from dpfx.config import load_config
    from dpfx.sampling import make_sampler
    from dpfx.train import restore_for_eval

    cfg = load_config(args.config, overrides=args.overrides)

    # multi-process pod launch convention shared with train.py/evaluate.py;
    # no-op without parallel.coordinator / JAX_COORDINATOR_ADDRESS
    from dpfx.parallel.distributed import initialize_from_config

    initialize_from_config(cfg.parallel)

    model, params, step = restore_for_eval(cfg, args.step)
    n_points = args.n_points or cfg.data.n_points_eval

    temp = cfg.eval.temperature if args.temperature is None else args.temperature
    ltemp = (cfg.eval.latent_temperature if args.latent_temperature is None
             else args.latent_temperature)
    sampler = make_sampler(model, params, args.n_clouds, n_points,
                           temperature=temp, latent_temperature=ltemp)
    rng = jax.random.PRNGKey(args.seed)
    clouds = sampler(rng)  # compile
    jax.block_until_ready(clouds)
    t0 = time.perf_counter()
    clouds = np.asarray(sampler(jax.random.fold_in(rng, 1)))
    dt = time.perf_counter() - t0
    if jax.process_index() == 0:  # coordinator writes, pods don't race
        np.save(args.out, clouds)
    if args.png and jax.process_index() == 0:
        from dpfx.utils import save_cloud_montage

        saved = save_cloud_montage(clouds, args.png)
        print(f"[dpfx] montage -> {saved or 'skipped (no PIL)'}")
    print(
        f"[dpfx] sampled {clouds.shape} from step-{step} checkpoint in {dt*1e3:.1f}ms "
        f"({args.n_clouds / dt:,.1f} clouds/s, {args.n_clouds * n_points / dt:,.0f} pts/s) "
        f"-> {args.out}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
