"""Materialize the synthetic family as a PointFlow-style ShapeNet tree
(``root/<synset>/<split>/<model>.npy`` — dpfx/data/shapenet.py
ShapeNetNpyDir), so the PRODUCTION data path — directory scan, per-file
lazy loads, per_shape/global normalization with streamed train-split
stats, labels — can be exercised end-to-end at flagship scale while the
real ShapeNet is unavailable (SURVEY.md §0/§9.5). Each v2 shape kind maps
to one real synset id so ``category: all`` per-category tables work.

Usage: python tools/make_synthetic_shapenet.py /tmp/fake_shapenet \
           [--train 8192] [--valtest 2048] [--points 4096] [--family v2]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dpfx.data.shapenet import SYNSET_IDS  # noqa: E402
from dpfx.data.synthetic import SyntheticDataset  # noqa: E402

# one real synset per v2 kind: per-kind trees, reference-shaped
KIND_TO_CATEGORY = ["airplane", "chair", "car", "table", "lamp"]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("root")
    ap.add_argument("--train", type=int, default=8192)
    ap.add_argument("--valtest", type=int, default=2048)
    ap.add_argument("--points", type=int, default=4096)
    ap.add_argument("--family", default="v2")
    args = ap.parse_args(argv)

    for split, size in (("train", args.train), ("val", args.valtest),
                        ("test", args.valtest)):
        ds = SyntheticDataset(size=size, n_stored=args.points,
                              family=args.family, split=split, cache=False)
        n_kinds = len(ds.label_names)
        for i in range(size):
            cat = KIND_TO_CATEGORY[ds.label(i) % len(KIND_TO_CATEGORY)]
            d = os.path.join(args.root, SYNSET_IDS[cat], split)
            os.makedirs(d, exist_ok=True)
            np.save(os.path.join(d, f"model_{i:06d}.npy"), ds[i])
        print(f"[make_synthetic_shapenet] {split}: {size} clouds x "
              f"{args.points} pts over {n_kinds} kinds -> {args.root}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
