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


def _process_start_monotonic() -> float:
    """`time.monotonic()` value at which THIS PROCESS started (Linux).

    A driver kill timer spans the whole process, including the multi-minute
    module-level `import jax` (TPU relay registration) that runs BEFORE any
    Budget can be constructed — anchoring at construction time would blind
    the guard to exactly the cost that caused the round-4 rc=124 kills.
    /proc/self/stat field 22 is the process start in clock ticks since boot;
    CLOCK_MONOTONIC (= time.monotonic() on Linux) shares that boot epoch
    with /proc/uptime. Falls back to "now" where /proc is unavailable.
    """
    try:
        with open("/proc/self/stat") as f:
            stat = f.read()
        # comm (field 2) may contain spaces/parens; split after the last ')'
        start_ticks = float(stat.rsplit(")", 1)[1].split()[19])
        with open("/proc/uptime") as f:
            uptime_s = float(f.read().split()[0])
        age_s = uptime_s - start_ticks / os.sysconf("SC_CLK_TCK")
        return time.monotonic() - max(0.0, age_s)
    except Exception:
        return time.monotonic()


class Budget:
    """Monotonic wall-clock budget with an env-configurable deadline,
    anchored at PROCESS start (not construction) so module-level import
    cost counts against the budget exactly as it counts against an
    external kill timer.

    >>> b = Budget("BENCH_DEADLINE_S", 420.0)
    >>> if b.exceeded(margin=30.0):  # < 30 s left: stop starting new work
    ...     pass
    """

    def __init__(self, env: str, default_s: float,
                 since_process_start: bool = True):
        self.t0 = (_process_start_monotonic() if since_process_start
                   else time.monotonic())
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
