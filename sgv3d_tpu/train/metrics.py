"""Structured metrics: JSONL stream + simple stdout logging.

Replaces the reference's Lightning self.log + tensorboardX
(SURVEY.md §5 'Metrics / logging'); one JSON object per step keeps the
artifact grep-able and diffable.
"""
from __future__ import annotations

import json
import os
import time
from typing import Mapping

import jax
import numpy as np


class MetricsLogger:
    def __init__(self, path: str, print_every: int = 50,
                 tensorboard_dir: str | None = None):
        """JSONL at `path` (canonical); optionally mirror scalar metrics to a
        TensorBoard event file under `tensorboard_dir` (our dependency-free
        writer, train/tb_writer.py — `tensorboard --logdir` renders it)."""
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a", buffering=1)
        self.print_every = print_every
        self._t0 = time.time()
        self._tb = None
        if tensorboard_dir is not None:
            from sgv3d_tpu.train.tb_writer import ScalarWriter
            self._tb = ScalarWriter(tensorboard_dir)

    def log(self, step: int, metrics: Mapping[str, object], **extra) -> None:
        record = {"step": int(step), "time": round(time.time() - self._t0, 2)}
        for k, v in {**metrics, **extra}.items():
            v = jax.device_get(v)
            record[k] = float(v) if np.ndim(v) == 0 else np.asarray(v).tolist()
        self._f.write(json.dumps(record) + "\n")
        if self._tb is not None:
            self._tb.add_scalars(step, {
                k: v for k, v in record.items()
                if k not in ("step",) and isinstance(v, (int, float))})
        if self.print_every and step % self.print_every == 0:
            keys = [k for k in ("total_loss", "detection_loss",
                                "semantic_loss", "grad_norm", "lr")
                    if k in record]
            msg = " ".join(f"{k}={record[k]:.4f}" for k in keys)
            print(f"[step {step}] {msg}", flush=True)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
