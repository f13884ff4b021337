#!/usr/bin/env python
"""Evaluate a trained DPF model (SURVEY.md §3.3/§3.4 call stacks).

Usage:
    python evaluate.py configs/<experiment>.yaml [key=value ...] [--step N]

Task is taken from the config's `experiment`:
  ae  -> reconstruction CD/EMD on the test split (C13)
  gen -> sample |test| clouds and run MMD/COV/1-NNA/JSD (C14)
  svr -> reconstruction from images (when the paired dataset is configured)
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("overrides", nargs="*")
    ap.add_argument("--step", type=int, default=None, help="checkpoint step (default: latest)")
    ap.add_argument("--limit", type=int, default=None, help="cap test-set size")
    ap.add_argument("--impl", default="auto", choices=["auto", "pallas", "jnp"])
    ap.add_argument("--out", default=None, help="append the results JSON to this file")
    args = ap.parse_args(argv)

    import jax

    from dpfx.config import load_config
    from dpfx.data import build_dataset, eval_subset, load_all, load_all_images
    from dpfx.metrics import evaluate_generation, evaluate_reconstruction
    from dpfx.parallel import create_mesh
    from dpfx.train import restore_for_eval

    cfg = load_config(args.config, overrides=args.overrides)

    # multi-process (one process per host on a pod): must run before the
    # first device access so train/eval/generate share one launch
    # convention; no-op unless parallel.coordinator or the
    # JAX_COORDINATOR_ADDRESS env var is set
    from dpfx.parallel.distributed import initialize_from_config

    initialize_from_config(cfg.parallel)

    model, params, step = restore_for_eval(cfg, args.step)
    print(f"[dpfx] evaluating {cfg.experiment} @ step {step}")

    test_ds = build_dataset(cfg.data, "test", cfg.model.image_encoder.image_size)
    # a PREFIX --limit on a category-grouped tree (ShapeNet layouts list one
    # synset after another) would eval against a single category; the shared
    # eval-subset convention stratifies by label (dpfx.data.eval_subset —
    # the same helper the oracle tool uses, so brackets can't drift)
    indices, subset_labels = eval_subset(test_ds, args.limit)
    clouds = load_all(test_ds, cfg.data.n_points_eval, limit=args.limit,
                      indices=indices)
    images = (load_all_images(test_ds, limit=args.limit, indices=indices)
              if cfg.experiment == "svr" else None)
    # per-category reporting for all-category runs (SURVEY.md §6 tables)
    labels = subset_labels if cfg.data.category == "all" else None
    label_names = getattr(test_ds, "label_names", None)
    rng = jax.random.PRNGKey(0)
    mesh = create_mesh(cfg.parallel.axis_name, n_devices=cfg.parallel.data_axis)

    if cfg.experiment in ("ae", "svr"):
        results = evaluate_reconstruction(
            model, params, clouds, cfg, rng, images=images, impl=args.impl,
            labels=labels, label_names=label_names,
        )
    elif cfg.experiment == "gen":
        results = evaluate_generation(
            model, params, clouds, cfg, rng, mesh=mesh, impl=args.impl,
            labels=labels, label_names=label_names,
        )
    else:
        raise ValueError(f"unknown experiment {cfg.experiment!r}")

    line = json.dumps({"step": step, "n_test": int(clouds.shape[0]), **results})
    print(line)
    if args.out and jax.process_index() == 0:  # coordinator writes, pods don't race
        with open(args.out, "a") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
