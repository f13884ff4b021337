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

    # multi-process (one process per host on a pod): must run before the
    # first device access; no-op unless parallel.coordinator or the
    # JAX_COORDINATOR_ADDRESS env var is set
    from dpfx.parallel.distributed import initialize_from_config

    initialize_from_config(cfg.parallel)

    from dpfx.data import build_dataset, iterate_batches
    from dpfx.train import Trainer

    if cfg.train.epochs > 0:
        # reference-style epoch accounting (SURVEY.md §3.1): derive steps
        probe_ds = build_dataset(cfg.data, "train", cfg.model.image_encoder.image_size)
        cfg.train.steps = cfg.train.epochs * max(len(probe_ds) // cfg.train.batch_size, 1)
        print(f"[dpfx] epochs={cfg.train.epochs} -> steps={cfg.train.steps}")

    trainer = Trainer(cfg)
    print(f"[dpfx] experiment={cfg.experiment} name={cfg.name} "
          f"devices={len(trainer.mesh.devices.flatten())} mesh={trainer.mesh.shape}")
    if args.resume:
        trainer.maybe_resume()

    svr = cfg.experiment == "svr"
    image_size = cfg.model.image_encoder.image_size
    train_ds = build_dataset(cfg.data, "train", image_size)
    val_ds = build_dataset(cfg.data, "val", image_size)
    print(f"[dpfx] train={len(train_ds)} val={len(val_ds)} clouds; "
          f"N={cfg.data.n_points} batch={cfg.train.batch_size}"
          + (f" images={image_size}px" if svr else ""))

    def val_batches():
        return iterate_batches(
            val_ds, cfg.eval.batch_size, cfg.data.n_points_eval,
            seed=0, shuffle=False, epochs=1, drop_last=False, with_images=svr,
        )

    if cfg.data.device_resident:
        # TPU-native data path: the whole split lives in HBM; batching
        # happens on device inside the dispatched call (dpfx/data/device.py).
        # SVR preloads the paired render stack too. On a multi-process pod
        # with parallel.resident_sharding=sharded, each process loads ONLY
        # its own padded row block (per-host loading) and the stack's cloud
        # axis is sharded over the global mesh.
        from dpfx.data.device import preload_clouds, preload_images

        resident_kwargs = {}
        if trainer.multiprocess and cfg.parallel.resident_sharding == "sharded":
            from dpfx.parallel.distributed import process_local_rows

            s_logical = len(train_ds)
            start, stop = process_local_rows(s_logical, trainer.mesh)
            rows = [g % s_logical for g in range(start, stop)]
            clouds = preload_clouds(train_ds, indices=rows)
            images = preload_images(train_ds, indices=rows) if svr else None
            resident_kwargs = dict(clouds_are_local_shard=True,
                                   logical_rows=s_logical)
            print(f"[dpfx] per-host resident block: rows [{start}, {stop}) "
                  f"of {s_logical} ({clouds.nbytes / 1e6:.0f} MB/host)")
        else:
            clouds = preload_clouds(train_ds)
            images = preload_images(train_ds) if svr else None
            print(f"[dpfx] device-resident split: {clouds.shape[0]} clouds x "
                  f"{clouds.shape[1]} stored pts "
                  f"({clouds.nbytes / 1e6:.0f} MB -> HBM)"
                  + (f" + renders ({images.nbytes / 1e6:.0f} MB)"
                     if svr else ""))
        trainer.fit_auto(resident_clouds=clouds, resident_images=images,
                         val_batches_fn=val_batches, **resident_kwargs)
        if trainer.last_eval_step != int(trainer.state.step):
            trainer.evaluate(val_batches())
        print(f"[dpfx] done at step {int(trainer.state.step)}; "
              f"checkpoints in {trainer.ckpt.directory}")
        return 0

    native_batcher = None
    if cfg.data.packed_path and not svr:
        # native C++ threaded loader over a packed cloud stack
        from dpfx.native import NativeBatcher, native_available

        if native_available():
            # packed stacks are written from dataset[i], i.e. already carry
            # the dataset-level normalization — never re-normalize here
            native_batcher = NativeBatcher(
                cfg.data.packed_path, cfg.train.batch_size, cfg.data.n_points,
                normalize="none",
                seed=cfg.train.seed, n_workers=max(cfg.data.num_workers, 2),
            )
            print(f"[dpfx] native loader: {native_batcher.n_items} clouds x "
                  f"{native_batcher.n_stored} pts from {cfg.data.packed_path}")
        else:
            print("[dpfx] native loader unavailable; falling back to numpy loader")

    def make_batches():
        # a CALLABLE so fit_auto can restart the stream after a divergence
        # recovery (train.recover_on_divergence)
        if native_batcher is not None:
            return iter(native_batcher)
        shard = None
        if trainer.multiprocess:
            # per-host feeding: each process loads only its devices' slice
            # of every global batch (dpfx/data/loader.py batch_shard)
            from dpfx.parallel.distributed import process_local_rows

            shard = process_local_rows(cfg.train.batch_size, trainer.mesh)
        batches = iterate_batches(
            train_ds, cfg.train.batch_size, cfg.data.n_points,
            seed=cfg.train.seed, with_images=svr, batch_shard=shard,
        )
        if cfg.data.num_workers > 0:
            from dpfx.data import prefetch_batches

            batches = prefetch_batches(batches, depth=cfg.data.num_workers)
        return batches

    trainer.fit_auto(make_batches, val_batches_fn=val_batches)
    if trainer.last_eval_step != int(trainer.state.step):
        # skip a redundant re-eval when the cadence already evaluated at
        # the final step
        trainer.evaluate(val_batches())
    print(f"[dpfx] done at step {int(trainer.state.step)}; "
          f"checkpoints in {trainer.ckpt.directory}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
