"""Tracing/profiling subsystem (SURVEY.md §5 'Tracing / profiling').

The reference ships Lightning's default-on `profiler='simple'` per-hook wall
times (/root/reference/exps/sgv3d/...r50...py:524) and nothing else; the
rebuild's counterpart is sgv3d_tpu/train/profiling.py: SimpleProfiler (wired
into runner.train), jax.profiler trace(), and the fenced timing helpers used
by the relay-safe perf tools.
"""
import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import pytest

from sgv3d_tpu.train import profiling


def test_simple_profiler_accounting():
    prof = profiling.SimpleProfiler()
    with prof.profile("a"):
        time.sleep(0.01)
    with prof.profile("a"):
        time.sleep(0.01)
    with prof.profile("b"):
        pass
    assert prof.counts["a"] == 2 and prof.counts["b"] == 1
    assert prof.totals["a"] >= 0.02
    s = prof.summary()
    # header + one row per section, sorted by total desc -> 'a' first
    lines = s.splitlines()
    assert len(lines) == 3 and lines[1].startswith("a") and "Calls" in lines[0]


def test_simple_profiler_charges_crashing_section():
    prof = profiling.SimpleProfiler()
    with pytest.raises(RuntimeError):
        with prof.profile("boom"):
            raise RuntimeError("x")
    assert prof.counts["boom"] == 1


def test_profile_iter_charges_generator_wait():
    prof = profiling.SimpleProfiler()

    def slow_gen():
        for i in range(3):
            time.sleep(0.005)
            yield i

    out = list(profiling.profile_iter(prof, "data_wait", slow_gen()))
    assert out == [0, 1, 2]
    # 3 yields + the final StopIteration probe are all charged
    assert prof.counts["data_wait"] == 4
    assert prof.totals["data_wait"] >= 0.015


def test_time_fn_fenced():
    f = jax.jit(lambda x: x * 2.0)
    dt = profiling.time_fn(f, jnp.ones((8, 8)), iters=3, warmup=1)
    assert dt > 0.0


def test_trace_writes_tensorboard_trace(tmp_path):
    log_dir = str(tmp_path / "trace")
    with profiling.trace(log_dir):
        jax.block_until_ready(jax.jit(lambda x: x + 1)(jnp.zeros((4,))))
    # jax.profiler writes plugins/profile/<ts>/*.trace.json.gz etc.
    found = []
    for root, _, files in os.walk(log_dir):
        found += [os.path.join(root, f) for f in files]
    assert found, "trace() produced no profile files"


@pytest.mark.slow  # 125 s on the 1-core host
def test_runner_train_prints_simple_profile(tmp_path, capsys):
    """runner.train carries the reference's default-on 'simple' profiler:
    a per-section summary (data wait / dispatch / log / ckpt) at exit, and
    --trace records a TB trace of the run."""
    from sgv3d_tpu import runner
    from sgv3d_tpu.data.synthetic import write_fake_kitti_root
    from tests.tiny_configs import tiny_exp

    root = write_fake_kitti_root(tmp_path / "rope3d-kitti", 2,
                                 src_hw=(216, 384))
    cfg = tiny_exp(is_bsm=False)
    cfg = dataclasses.replace(cfg, batch_size_per_device=1, data_root=root,
                              src_hw=(216, 384))
    trace_dir = str(tmp_path / "tb_trace")
    runner.train(cfg, data_root=root, output_dir=str(tmp_path / "out"),
                 max_steps=1, num_devices=1, backup=False,
                 trace_dir=trace_dir)
    out = capsys.readouterr().out
    assert "train profile (simple)" in out
    for section in ("data_wait", "step_dispatch", "metrics_log",
                    "checkpoint"):
        assert section in out, f"missing profiled section {section}"
    assert any(files for _, _, files in os.walk(trace_dir)), \
        "--trace produced no profile files"
