"""Scalar metric writers (SURVEY.md §5 metrics bullet; §2 C18).

The reference logs scalars to the console only (C18, MED confidence —
TensorBoard presence LOW, unverifiable against the empty mount). The build
does strictly better with two machine-readable streams:

  * ``metrics.jsonl`` — always on: one JSON record per log event, the
    round-1 stream consumed by tests and tools.
  * TensorBoard event files via ``clu.metric_writers`` — opt-in with
    ``train.tensorboard: true`` (SURVEY.md §5 named clu as the build
    target). Imported lazily: clu's summary writer pulls in tensorflow,
    which costs seconds and is never needed when the flag is off.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional


class ScalarWriter:
    """Fan-out scalar writer: jsonl always, TensorBoard optionally.

    ``write`` takes a flat record dict; non-numeric values (e.g. ``kind``)
    go to jsonl only, numeric scalars additionally become TensorBoard
    scalars tagged ``{kind}/{key}`` at ``step``.
    """

    def __init__(self, directory: str, tensorboard: bool = False,
                 jsonl_name: str = "metrics.jsonl"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.jsonl_path = os.path.join(self.directory, jsonl_name)
        self._tb = None
        if tensorboard:
            from clu import metric_writers  # lazy: imports tensorflow

            self.tb_dir = os.path.join(self.directory, "tb")
            self._tb = metric_writers.SummaryWriter(self.tb_dir)

    def write(self, record: Dict[str, Any], step: Optional[int] = None) -> None:
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._tb is None:
            return
        step = step if step is not None else int(record.get("step", 0))
        kind = record.get("kind", "train")
        scalars = {
            f"{kind}/{k}": float(v)
            for k, v in record.items()
            if k not in ("step", "kind") and isinstance(v, (int, float))
        }
        if scalars:
            self._tb.write_scalars(step, scalars)

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
            self._tb = None
