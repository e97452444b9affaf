"""Structured training metrics: append-only JSONL scalars.

The reference has no metrics sink at all (SURVEY.md §5.5 — wall-clock prints
only; its conda env ships neptune-client but nothing uses it).  This is the
minimal production-grade alternative: one JSON object per logged step,
flushed on write, safe to tail/plot/ingest while training runs.  Multi-host
runs write from process 0 only.
"""
from __future__ import annotations

import json
import os
import time
from typing import IO, Optional

import jax
import numpy as np


class MetricsLogger:
    """Append ``{"step": N, "wall_time": T, **scalars}`` lines to a file.

    No-op when ``path`` is None or on processes > 0, so trainers can call it
    unconditionally.
    """

    def __init__(self, path: Optional[str]):
        self._fh: Optional[IO[str]] = None
        if path and jax.process_index() == 0:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a", buffering=1)

    def log(self, step: int, metrics: dict) -> None:
        if self._fh is None:
            return
        row = {"step": int(step), "wall_time": time.time()}
        for k, v in metrics.items():
            arr = np.asarray(v)
            if arr.size == 1:
                row[k] = float(arr)
        self._fh.write(json.dumps(row) + "\n")

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def __enter__(self) -> "MetricsLogger":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
