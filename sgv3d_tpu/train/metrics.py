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
        self._pending = None
        if tensorboard_dir is not None:
            from sgv3d_tpu.train.tb_writer import ScalarWriter
            self._tb = ScalarWriter(tensorboard_dir)

    def log(self, step: int, metrics: Mapping[str, object], **extra) -> None:
        """Record step metrics. The device fetch (and the JSONL write) for
        step i happens on the log() call for step i+1, so the host transfer
        overlaps the next step's compute instead of fencing the device every
        step — synchronously fetching a handful of loss scalars costs a full
        relay/PCIe round-trip per step otherwise. close() flushes the last
        pending step."""
        stamp = round(time.time() - self._t0, 2)
        pending = self._pending
        self._pending = (step, dict(metrics), extra, stamp)
        if pending is not None:
            self._write(*pending)

    def _write(self, step: int, metrics: Mapping[str, object], extra,
               stamp: float) -> None:
        record = {"step": int(step), "time": stamp}
        fetched = jax.device_get({**metrics, **extra})
        for k, v in fetched.items():
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
        if self._pending is not None:
            self._write(*self._pending)
            self._pending = None
        self._f.close()
        if self._tb is not None:
            self._tb.close()
