"""Wall-clock budget helper used by every driver entry point (bench.py,
bench_train.py, __graft_entry__.py) to degrade gracefully instead of being
killed rc=124 with an empty tail (VERDICT r4)."""
import time

from sgv3d_tpu.utils.budget import Budget

# captured at collection time, strictly after process start
_T_MODULE = time.monotonic()


def test_budget_env_override_and_exceeded(monkeypatch):
    monkeypatch.setenv("T_DEADLINE", "0.05")
    b = Budget("T_DEADLINE", 999.0, since_process_start=False)
    assert b.limit == 0.05
    assert not b.exceeded(margin=-1.0)
    time.sleep(0.06)
    assert b.exceeded()
    assert b.remaining() < 0


def test_budget_default_margin_and_stamp(monkeypatch):
    monkeypatch.delenv("T_DEADLINE2", raising=False)
    b = Budget("T_DEADLINE2", 30.0, since_process_start=False)
    assert b.limit == 30.0
    assert not b.exceeded()
    # 29+ s remain: a 10 s margin is comfortably met
    assert not b.exceeded(margin=10.0)
    assert b.exceeded(margin=35.0)  # margin larger than the whole budget
    assert b.stamp().startswith("[t=") and b.stamp().endswith("s]")


def test_budget_anchors_at_process_start(monkeypatch):
    """An external kill timer spans the whole process, including the
    module-level `import jax` relay registration — the default Budget must
    count that time too (the round-4 rc=124 root cause; code review r5)."""
    monkeypatch.delenv("T_DEADLINE3", raising=False)
    b = Budget("T_DEADLINE3", 9999.0)
    # this test runs well after this module (and the whole suite's imports)
    # were collected; process-start elapsed must cover at least that span
    assert b.elapsed() >= (time.monotonic() - _T_MODULE) - 0.001
    assert b.elapsed() < 24 * 3600  # sane: not absolute-epoch-sized
