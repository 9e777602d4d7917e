"""Software-pipelined dispatch/collect over an iterable of batches.

On the TPU relay, fetching a batch's results to host costs a full device
round-trip; dispatching batch i before collecting batch i-1 overlaps that
readback with i's on-device compute (+32% measured batch-8 serving
throughput, tools/probe_bench_overlap.py). This is the one shared
implementation behind `api.BEVHeightPredictor.stream` and the runner's
evaluation loop; bench.py and tools/probe_bench_overlap.py keep hand-rolled
copies because their loop structure IS the measurement (warmup dispatches and
the timer placement are part of the harness).
"""
from __future__ import annotations

from typing import Callable, Iterable, Iterator, TypeVar

T = TypeVar("T")
P = TypeVar("P")
R = TypeVar("R")


def pipelined(batches: Iterable[T], dispatch: Callable[[T], P],
              collect: Callable[[P], R]) -> Iterator[R]:
    """Yield collect(dispatch(batch)) per batch, one dispatch ahead.

    Equivalent to `map(collect, map(dispatch, batches))` except batch i is
    dispatched before batch i-1 is collected, so the host-side collect
    overlaps device compute. Results are yielded in input order; the tail
    is flushed after the iterable is exhausted.
    """
    prev = None
    have_prev = False
    for batch in batches:
        cur = dispatch(batch)
        if have_prev:
            yield collect(prev)
        prev, have_prev = cur, True
    if have_prev:
        yield collect(prev)
