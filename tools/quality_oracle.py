"""Oracle grounding for the generation-quality protocol (SURVEY.md §3.3):
run compute_all_metrics with REAL data standing in for the generated set.

Two brackets around any trained model's numbers:
  * train-vs-test — S held-out-disjoint real clouds from the train split.
    This is the "perfect generator" row: MMD at the dataset's intrinsic
    pairing cost, COV high, 1-NNA near 50%, JSD near 0.
  * noise-vs-test — Gaussian clouds matched to the test set's global scale.
    The "broken generator" row: 1-NNA near 100%.

Without the reference repo or ShapeNet on disk (SURVEY.md §0), these two
rows are what makes the synthetic quality table interpretable: a model row
is meaningful exactly insofar as it sits near the train-vs-test row.

Usage: python tools/quality_oracle.py configs/flagship_quality_synthetic.yaml \
           [--limit 400] [--metrics cd,emd] [--out results.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("overrides", nargs="*")
    ap.add_argument("--limit", type=int, default=400)
    ap.add_argument("--metrics", default=None, help="override eval.metrics, e.g. cd,emd")
    ap.add_argument("--impl", default="auto", choices=["auto", "pallas", "jnp"])
    ap.add_argument("--skip-noise", action="store_true")
    ap.add_argument("--out", default=None, help="append result JSON lines here")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from dpfx.config import load_config
    from dpfx.data import build_dataset, eval_subset, load_all
    from dpfx.metrics import compute_all_metrics
    from dpfx.parallel import create_mesh

    cfg = load_config(args.config, overrides=args.overrides)
    metrics = args.metrics.split(",") if args.metrics else cfg.eval.metrics
    test_ds = build_dataset(cfg.data, "test", cfg.model.image_encoder.image_size)
    train_ds = build_dataset(cfg.data, "train", cfg.model.image_encoder.image_size)

    # the SAME subset convention as evaluate.py (shared helper, so the
    # oracle brackets and the model eval can never drift apart)
    ti, test_labels = eval_subset(test_ds, args.limit)
    ri, _ = eval_subset(train_ds, args.limit)
    ref = load_all(test_ds, cfg.data.n_points_eval, limit=args.limit, indices=ti)
    fake_real = load_all(train_ds, cfg.data.n_points_eval, limit=args.limit, indices=ri)
    labels = test_labels if cfg.data.category == "all" else None
    label_names = getattr(test_ds, "label_names", None)
    mesh = create_mesh(cfg.parallel.axis_name, n_devices=cfg.parallel.data_axis)
    s = ref.shape[0]
    print(f"# oracle: S={s} N={ref.shape[1]} metrics={metrics}")

    common = dict(metrics=metrics, impl=args.impl, mesh=mesh,
                  jsd_resolution=cfg.eval.jsd_resolution,
                  ref_labels=labels, label_names=label_names,
                  precision=cfg.eval.pairwise_precision or None,
                  jsd_frame=cfg.eval.jsd_frame)
    rows = []
    r = compute_all_metrics(jnp.asarray(fake_real), jnp.asarray(ref), **common)
    rows.append({"oracle": "train_vs_test", "n": s, **r})
    print(json.dumps(rows[-1]))

    if not args.skip_noise:
        rng = np.random.default_rng(0)
        scale = float(np.std(ref))
        noise = rng.normal(scale=scale, size=ref.shape).astype(np.float32)
        r = compute_all_metrics(jnp.asarray(noise), jnp.asarray(ref), **common)
        rows.append({"oracle": "noise_vs_test", "n": s, **r})
        print(json.dumps(rows[-1]))

    if args.out:
        with open(args.out, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
