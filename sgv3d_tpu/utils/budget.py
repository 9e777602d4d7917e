"""Wall-clock self-budgeting for driver entry points (VERDICT r4 next #8).

The round-4 driver killed both `bench.py` (rc=124, no JSON printed) and the
multichip dryrun (rc=124 at step 50/200) because each entry point assumed an
unbounded budget. Every driver-facing script now owns a `Budget` started at
import/process start and degrades — fewer iterations / fewer training rounds,
always emitting the latest completed measurement — instead of being killed
silently.

The deadline is env-configurable (a driver harness with a known tighter
budget can export it); the defaults are chosen well inside the observed
driver envelope (round-3 artifacts passed; round-4's additions did not).
"""
from __future__ import annotations

import os
import time


class Budget:
    """Monotonic wall-clock budget with an env-configurable deadline.

    >>> b = Budget("BENCH_DEADLINE_S", 420.0)
    >>> if b.exceeded(margin=30.0):  # < 30 s left: stop starting new work
    ...     pass
    """

    def __init__(self, env: str, default_s: float):
        self.t0 = time.monotonic()
        self.limit = float(os.environ.get(env, default_s))

    def elapsed(self) -> float:
        return time.monotonic() - self.t0

    def remaining(self) -> float:
        return self.limit - self.elapsed()

    def exceeded(self, margin: float = 0.0) -> bool:
        """True when fewer than `margin` seconds remain in the budget."""
        return self.remaining() <= margin

    def stamp(self) -> str:
        """Short `[t=123.4s]` prefix for progress lines."""
        return f"[t={self.elapsed():.1f}s]"
