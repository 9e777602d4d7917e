"""Wall-clock budget helper used by every driver entry point (bench.py,
bench_train.py, __graft_entry__.py) to degrade gracefully instead of being
killed rc=124 with an empty tail (VERDICT r4)."""
import time

from sgv3d_tpu.utils.budget import Budget


def test_budget_env_override_and_exceeded(monkeypatch):
    monkeypatch.setenv("T_DEADLINE", "0.05")
    b = Budget("T_DEADLINE", 999.0)
    assert b.limit == 0.05
    assert not b.exceeded(margin=-1.0)
    time.sleep(0.06)
    assert b.exceeded()
    assert b.remaining() < 0


def test_budget_default_margin_and_stamp(monkeypatch):
    monkeypatch.delenv("T_DEADLINE2", raising=False)
    b = Budget("T_DEADLINE2", 30.0)
    assert b.limit == 30.0
    assert not b.exceeded()
    # 29+ s remain: a 10 s margin is comfortably met
    assert not b.exceeded(margin=10.0)
    assert b.exceeded(margin=35.0)  # margin larger than the whole budget
    assert b.stamp().startswith("[t=") and b.stamp().endswith("s]")
