"""Multi-process worker for tests/test_multiprocess.py (one process per
"host" of a simulated v5e pod: N CPU devices per process, stitched by
`jax.distributed.initialize` — SURVEY.md §2.2 TPU disposition).

Runs a tiny resident-sharded training with PER-HOST data loading: this
process materializes ONLY its own padded row block of the split (the
pattern a real multi-host pod uses so no host ever holds the full
dataset), then `Trainer.fit_resident(..., clouds_are_local_shard=True)`.
Prints one JSON line with the logged losses for the test to compare
against a single-process 8-device run.

``mode`` = "resident" (default; resident-sharded stack, per-host row
blocks), "hostfed" (Trainer.fit with per-host batch shards via
iterate_batches(batch_shard=...) + a multi-process ragged-batch eval), or
"resume" (resident-sharded: train 3 steps, checkpoint, rebuild the
Trainer, maybe_resume, continue to 6 — the pod checkpoint staging path at
Trainer.maybe_resume).

Usage: python mp_worker.py <process_id> <num_processes> <port> \
          <devices_per_proc> <ckpt_dir> [mode] [n_stored]
"""

import json
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
dpp = int(sys.argv[4])
ckpt_dir = sys.argv[5]
mode = sys.argv[6] if len(sys.argv) > 6 else "resident"
n_stored = int(sys.argv[7]) if len(sys.argv) > 7 else 64

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={dpp}"
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                           process_id=pid)

import numpy as np  # noqa: E402

from dpfx.config import config_from_dict  # noqa: E402
from dpfx.data import SyntheticDataset  # noqa: E402
from dpfx.parallel.distributed import process_local_rows  # noqa: E402
from dpfx.train import Trainer  # noqa: E402

S = 48  # logical split size

cfg = config_from_dict({
    "experiment": "gen",
    "name": "mp_worker",
    "model": {
        "dz": 16,
        "point_flow": {"n_layers": 4, "hidden": 32, "n_hidden": 2},
        "latent_flow": {"n_layers": 4, "hidden": 32, "n_hidden": 2},
        "encoder": {"point_widths": [32, 64], "head_widths": [32]},
    },
    "data": {"dataset": "synthetic", "n_points": 64, "synthetic_size": S,
             "device_resident": mode in ("resident", "resume")},
    "parallel": {"resident_sharding": "sharded"},
    "train": {"batch_size": 16, "steps": 6, "steps_per_call": 3, "lr": 1e-3,
              "log_every": 3, "ckpt_every": 1000, "eval_every": 1000,
              "ckpt_dir": ckpt_dir},
})

trainer = Trainer(cfg, log_fn=lambda *a, **k: None)
assert trainer.mesh.devices.size == nproc * dpp

ds = SyntheticDataset(size=S, n_stored=n_stored, split="train")

if mode in ("resident", "resume"):
    # per-host loading: only THIS process's padded row block materializes.
    # Padded global row g maps to dataset item g % S (cyclic, never drawn).
    start, stop = process_local_rows(S, trainer.mesh)
    local = np.stack([np.asarray(ds[g % S], np.float32)
                      for g in range(start, stop)])
    if mode == "resume":
        # leg 1: 3 steps, checkpoint at exit; leg 2: a FRESH Trainer
        # resumes through the multi-process staging path and finishes.
        # Resident draws are absolute-step keyed, so the second window
        # must reproduce the straight 6-step run's.
        trainer.fit_resident(local, clouds_are_local_shard=True,
                             logical_rows=S, steps=3)
        trainer2 = Trainer(cfg, log_fn=lambda *a, **k: None)
        resumed_from = trainer2.maybe_resume()
        assert resumed_from == 3, f"expected resume from step 3, got {resumed_from}"
        trainer2.fit_resident(local, clouds_are_local_shard=True,
                              logical_rows=S)
        trainer = trainer2
    else:
        trainer.fit_resident(local, clouds_are_local_shard=True,
                             logical_rows=S)
    val = {}
else:
    # host-fed: each process's loader yields its devices' slice of every
    # global batch (same seeded permutation, disjoint rows)
    from dpfx.data import iterate_batches

    shard = process_local_rows(cfg.train.batch_size, trainer.mesh)
    batches = iterate_batches(ds, cfg.train.batch_size, cfg.data.n_points,
                              seed=cfg.train.seed, batch_shard=shard)
    trainer.fit(batches)
    # multi-process eval with a ragged final batch (12 % 8 != 0): every
    # process loads the full (small) val batches; evaluate slices
    val_ds = SyntheticDataset(size=12, n_stored=n_stored, split="val")
    val = trainer.evaluate(iterate_batches(
        val_ds, 16, 64, seed=0, shuffle=False, epochs=1, drop_last=False))

print(json.dumps({
    "pid": pid,
    "losses": [h["loss"] for h in trainer.history],
    "val": val,
    "final_step": int(np.asarray(trainer.state.step)),
}), flush=True)
