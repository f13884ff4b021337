#!/usr/bin/env python
"""Data-side pin of the residual v3 quality gap (round-5): is the
generator's `chain` deficit a PART-COUNT coverage mismatch?

The v3 `chain` family (dpfx/data/synthetic.py::_v3_chain) draws k ~
Uniform{3..7} ellipsoid shells along a random Bezier curve; the S=400
protocol shows the largest DPF-vs-ideal deficit on this kind (COV-CD
0.275 vs ideal 0.35 after 200k steps, BASELINE.md). Per-cloud part-count
ESTIMATION is ill-posed here (overlapping shells: GMM-BIC measured
corr≈0 with true k; single-linkage merges adjacent parts — both probed
and rejected in round 5), so this tool pins the question with EXACT
ref-side covariates instead: every test item is deterministic in
(seed, idx), so the true k, scale, and curve geometry of each reference
chain are recoverable by replaying the generator's rng draws.

Protocol:
1. Load test refs (eval frame, stratified subset — same convention as
   evaluate.py) and a generated dump (`generate.py --out`).
2. Full-resolution pairwise CD (the eval's own kernel); per-gen argmin
   ref = the eval's COV assignment.
3. For chain refs: compare true-k / scale / curve-length distributions
   of COVERED vs UNCOVERED refs, and the nearest-ref-true-k histogram
   over gen clouds attributed to chains (what k the generator "likes")
   vs the uniform truth.
4. Report per-k mean min-distance (the per-ref MMD contribution).

Usage:
    python generate.py <cfg> --n-clouds 400 --out /tmp/gen.npy [--step N]
    python tools/part_count_pin.py <cfg> /tmp/gen.npy [--limit 400]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN_KIND = 2  # v3 kind order: scaffold, table, chain, winged, frame


def chain_covariates(ds, idx: int) -> dict:
    """Replay the dataset's per-item rng (synthetic.py __getitem__ v3 +
    _v3_chain draw order) to recover the true generator parameters."""
    rng = np.random.default_rng(ds.base + idx)
    scale = 0.6 + 0.4 * rng.uniform()
    k = int(rng.integers(3, 8))
    p0, p1, p2 = rng.uniform(-1, 1, size=(3, 3))
    t = np.linspace(0, 1, 64)[:, None]
    curve = (1 - t) ** 2 * p0 + 2 * (1 - t) * t * p1 + t**2 * p2
    length = float(np.linalg.norm(np.diff(curve, axis=0), axis=1).sum())
    return {"k": k, "scale": float(scale), "curve_len": length}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("gen_npy")
    ap.add_argument("--limit", type=int, default=400)
    ap.add_argument("--impl", default="auto", choices=["auto", "pallas", "jnp"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from dpfx.config import load_config
    from dpfx.data import build_dataset, eval_subset, load_all
    from dpfx.metrics.generation import pairwise_matrix

    cfg = load_config(args.config)
    if cfg.data.dataset != "synthetic" or cfg.data.synthetic_family != "v3":
        raise SystemExit("covariate replay only defined for the v3 synthetic family")
    test_ds = build_dataset(cfg.data, "test", cfg.model.image_encoder.image_size)
    indices, labels = eval_subset(test_ds, args.limit)
    labels = np.asarray(labels)
    refs = load_all(test_ds, cfg.data.n_points_eval, limit=args.limit,
                    indices=indices)
    gen = np.load(args.gen_npy).astype(np.float32)
    print(f"[pin] refs {refs.shape}, gen {gen.shape}")

    m_gr = np.asarray(pairwise_matrix(jnp.asarray(gen), jnp.asarray(refs),
                                      metric="cd", impl=args.impl))
    nearest = m_gr.argmin(axis=1)              # per-gen assigned ref (COV rule)
    min_dist = m_gr.min(axis=0)                # per-ref MMD contribution

    chain_rows = np.where(labels == CHAIN_KIND)[0]
    cov = {int(r): int((nearest == r).sum()) for r in chain_rows}
    covar = {int(r): chain_covariates(test_ds, int(indices[r]))
             for r in chain_rows}

    ks = np.array([covar[int(r)]["k"] for r in chain_rows])
    hits = np.array([cov[int(r)] for r in chain_rows])
    covered = hits > 0

    # gen-side attribution: over gen clouds whose nearest ref is a chain,
    # the true k of that ref (multiplicity-weighted)
    gen_k = np.concatenate([np.full(cov[int(r)], covar[int(r)]["k"])
                            for r in chain_rows]) if hits.sum() else np.array([])

    def khist(a):
        return {int(k): int((a == k).sum()) for k in range(3, 8)}

    per_k = {}
    for k in range(3, 8):
        sel = ks == k
        per_k[k] = {
            "n_refs": int(sel.sum()),
            "covered_frac": float(covered[sel].mean()),
            "mean_min_cd": float(min_dist[chain_rows][sel].mean()),
            "gen_hits": int(hits[sel].sum()),
        }

    def stats(key):
        vals = np.array([covar[int(r)][key] for r in chain_rows])
        return {"covered_mean": float(vals[covered].mean()),
                "uncovered_mean": float(vals[~covered].mean()) if (~covered).any() else None}

    result = {
        "n_chain_refs": int(chain_rows.size),
        "chain_cov": float(covered.mean()),
        "gen_clouds_attributed_to_chain": int(hits.sum()),
        "ref_true_k_hist": khist(ks),
        "covered_ref_k_hist": khist(ks[covered]),
        "uncovered_ref_k_hist": khist(ks[~covered]),
        "gen_nearest_ref_k_hist": khist(gen_k),
        "per_k": per_k,
        "scale": stats("scale"),
        "curve_len": stats("curve_len"),
    }
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(result) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
