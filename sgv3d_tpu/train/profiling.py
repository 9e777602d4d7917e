"""Tracing / profiling harness (SURVEY.md §5 'Tracing / profiling').

The reference exposes only Lightning's `profiler='simple'` wall times; here we
provide (a) a jax.profiler trace context that writes TensorBoard-compatible
traces, (b) a step timer with forced host-transfer fences (on the axon TPU
relay, `block_until_ready` does not synchronise — a device->host transfer is
the only reliable fence), and (c) a simple per-section wall-clock profiler
matching the reference's 'simple' output shape.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace -> TensorBoard `log_dir`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def fence(tree) -> None:
    """Reliable device fence: fetch one leaf to host."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(leaves[0])


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2,
            **kwargs) -> float:
    """Average seconds per call with host-transfer fencing."""
    for _ in range(warmup):
        fence(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
        fence(out)
    return (time.perf_counter() - t0) / iters


def profile_iter(prof: "SimpleProfiler", name: str, iterable):
    """Yield from `iterable`, charging each `next()` wait to `prof[name]`.

    Used by the training loop to account the data-loader stall time
    separately from step dispatch (the Lightning 'simple' profiler's
    get_train_batch / run_training_batch split)."""
    it = iter(iterable)
    while True:
        with prof.profile(name):
            try:
                item = next(it)
            except StopIteration:
                return
        yield item


class SimpleProfiler:
    """Per-section cumulative wall times (the Lightning 'simple' equivalent)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def profile(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = [f"{'Action':<40}{'Mean (s)':>12}{'Total (s)':>12}{'Calls':>8}"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            tot = self.totals[name]
            cnt = self.counts[name]
            lines.append(f"{name:<40}{tot / cnt:>12.4f}{tot:>12.2f}{cnt:>8}")
        return "\n".join(lines)
