#!/usr/bin/env python
"""Pack a dataset into a single float32 .npy cloud stack [S, N_stored, 3]
for the native loader (dpfx/native).

Usage:
    python tools/pack_dataset.py <config.yaml> --split train --out packed.npy \
        [--n-stored 4096]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("--split", default="train")
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-stored", type=int, default=4096)
    args = ap.parse_args(argv)

    import numpy as np

    sys.path.insert(0, ".")
    from dpfx.config import load_config
    from dpfx.data import build_dataset, sample_cloud

    cfg = load_config(args.config)
    ds = build_dataset(cfg.data, args.split)
    rng = np.random.default_rng(0)
    stack = np.stack(
        [sample_cloud(ds[i], args.n_stored, rng) for i in range(len(ds))]
    ).astype(np.float32)
    np.save(args.out, stack)
    # sidecar records that the dataset-level normalization is already baked
    # into the stack; NativeBatcher rejects conflicting re-normalization
    import json

    out_npy = args.out if args.out.endswith(".npy") else args.out + ".npy"
    with open(out_npy + ".meta.json", "w") as f:
        json.dump(
            {
                "normalize_applied": cfg.data.normalize,
                "dataset": cfg.data.dataset,
                "category": cfg.data.category,
                "split": args.split,
                "n_stored": args.n_stored,
            },
            f,
        )
    print(f"[dpfx] packed {stack.shape} ({stack.nbytes/1e6:.1f} MB) -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
