#!/usr/bin/env python
"""Convert a torch .pt checkpoint into a dpfx/orbax checkpoint
(SURVEY.md §2 C12: reference checkpoints must be preserved/convertible).

Usage:
    python convert_checkpoint.py <ckpt.pt> <config.yaml> --out <dir> \
        [--rules rules.yaml] [--no-strict]

Rules default to the dpfx torch-mirror naming; pass --rules with a YAML
name map for other module trees (e.g. the reference's, SURVEY.md §9.8).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint")
    ap.add_argument("config")
    ap.add_argument("--out", required=True)
    ap.add_argument("--rules", default=None)
    ap.add_argument("--no-strict", action="store_true")
    args = ap.parse_args(argv)

    from dpfx.compat import DEFAULT_RULES, load_rules_file, load_torch_checkpoint, save_as_orbax
    from dpfx.config import load_config

    cfg = load_config(args.config)
    rules = load_rules_file(args.rules) if args.rules else DEFAULT_RULES
    params = load_torch_checkpoint(args.checkpoint, cfg, rules, strict=not args.no_strict)
    save_as_orbax(params, args.out)
    import os
    import shlex

    parent, leaf = os.path.split(os.path.abspath(args.out))
    print(f"[dpfx] converted {args.checkpoint} -> {args.out} (verified against config)")
    # --step 0: latest_step() could pick a pre-existing higher step in the
    # same directory; quote everything for copy-paste safety
    print(f"[dpfx] evaluate with: python evaluate.py {shlex.quote(args.config)} "
          f"train.ckpt_dir={shlex.quote(parent)} name={shlex.quote(leaf)} --step 0")
    return 0


if __name__ == "__main__":
    sys.exit(main())
