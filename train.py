#!/usr/bin/env python
"""Train a DPF model from a YAML config (SURVEY.md §1 L6, §3.1).

Usage:
    python train.py configs/<experiment>.yaml [key=value overrides...] [--resume]

Mirrors the reference CLI shape: `python <script>.py <config.yaml> [overrides]`.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", help="YAML experiment config")
    ap.add_argument("overrides", nargs="*", help="dotted.key=value overrides")
    ap.add_argument("--resume", action="store_true", help="resume from latest checkpoint")
    ap.add_argument("--strict-config", action="store_true", help="reject unknown YAML keys")
    args = ap.parse_args(argv)

    from dpfx.config import load_config

    cfg = load_config(args.config, strict=args.strict_config, overrides=args.overrides)

    from dpfx.data import build_dataset, iterate_batches
    from dpfx.train import Trainer

    trainer = Trainer(cfg)
    print(f"[dpfx] experiment={cfg.experiment} name={cfg.name} "
          f"devices={len(trainer.mesh.devices.flatten())} mesh={trainer.mesh.shape}")
    if args.resume:
        trainer.maybe_resume()

    train_ds = build_dataset(cfg.data, "train")
    val_ds = build_dataset(cfg.data, "val")
    print(f"[dpfx] train={len(train_ds)} val={len(val_ds)} clouds; "
          f"N={cfg.data.n_points} batch={cfg.train.batch_size}")

    batches = iterate_batches(
        train_ds, cfg.train.batch_size, cfg.data.n_points, seed=cfg.train.seed
    )

    def val_batches():
        return iterate_batches(
            val_ds, cfg.eval.batch_size, cfg.data.n_points_eval,
            seed=0, shuffle=False, epochs=1, drop_last=False,
        )

    trainer.fit(batches, val_batches_fn=val_batches)
    trainer.evaluate(val_batches())
    print(f"[dpfx] done at step {int(trainer.state.step)}; "
          f"checkpoints in {trainer.ckpt.directory}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
