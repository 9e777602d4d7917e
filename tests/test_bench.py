"""Wiring smoke tests for the driver-facing benchmark entry points.

bench.py / bench_train.py are the artifacts the driver records every round;
a wiring regression (env knob parsing, config lookup, JSON schema) would
otherwise only surface at round end on real hardware. These run the full
main() on a tiny config, 1 iteration, CPU."""
import importlib
import io
import json
import os
import sys
from contextlib import redirect_stdout

import pytest

from tiny_configs import tiny_exp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_main(monkeypatch, module_name, env, tiny_kwargs):
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    monkeypatch.syspath_prepend(REPO)
    sys.modules.pop(module_name, None)
    # fresh import so the module re-reads its env-derived constants
    mod = importlib.import_module(module_name)
    import sgv3d_tpu.configs

    cfg = tiny_exp(**tiny_kwargs)
    monkeypatch.setattr(sgv3d_tpu.configs, "get_exp", lambda name: cfg)
    out = io.StringIO()
    with redirect_stdout(out):
        mod.main()
    line = out.getvalue().strip().splitlines()[-1]
    return json.loads(line)


@pytest.mark.slow  # 58 s on the 1-core host
def test_bench_infer_wiring(monkeypatch):
    rec = _run_main(
        monkeypatch, "bench",
        {"BENCH_BATCH": "1", "BENCH_ITERS": "1", "BENCH_EXP": "tiny",
         "BENCH_STATIC_RIG": "1", "BENCH_BF16_HEAD": "1"},
        {"is_bsm": False})
    assert rec["metric"] == "tiny_infer_images_per_sec"
    assert rec["unit"] == "images/sec/chip"
    assert rec["value"] > 0
    # non-default exp: the cached r101 torch baseline must not be applied
    assert rec["vs_baseline"] is None


@pytest.mark.slow
def test_bench_train_wiring(monkeypatch):
    rec = _run_main(
        monkeypatch, "bench_train",
        {"BENCH_TRAIN_BATCH": "1", "BENCH_TRAIN_ITERS": "1",
         "BENCH_TRAIN_EXP": "tiny", "BENCH_TRAIN_TOPK": "0"},
        {"is_bsm": True})
    assert rec["metric"] == "tiny_train_bs1_images_per_sec"
    assert rec["value"] > 0 and rec["ms_per_step"] > 0
