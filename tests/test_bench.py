"""End-to-end smoke of bench.py (BENCH_SMOKE=1: tiny model, 3 s audio,
forced CPU, guarded sections re-raise). bench.py runs ONCE per round on
the real chip and its sections are exception-guarded there — without
this test a regression in any mode would surface as a silently missing
field in the recorded benchmark."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_smoke_runs_all_modes():
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    if "xla_backend_optimization_level" not in flags:
        # same 6x XLA:CPU compile cut conftest.py applies to the suite —
        # smoke-mode numbers are meaningless, only the code paths matter
        flags = flags + " --xla_backend_optimization_level=0"
    env = dict(os.environ, BENCH_SMOKE="1", XLA_FLAGS=flags)
    # 3600 s: the smoke flow alone takes ~10 min on this single core, but
    # the suite shares the core with whatever else runs (a concurrent
    # perf/bench job twice starved a 1800 s limit into a false failure)
    res = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, timeout=3600,
                         env=env)
    assert res.returncode == 0, res.stderr[-3000:]
    line = res.stdout.strip().splitlines()[-1]
    assert len(line) < 1500, len(line)     # fits the driver tail capture
    out = json.loads(line)
    # every mode must have produced its record (numbers are meaningless
    # on CPU; presence proves the code path executes) — including the
    # multi-device section on the 8-device virtual mesh
    for key in ("metric", "value", "vs_baseline", "windowed_f32_rt",
                "dense_serving_rt_cnn_family_only", "windowed_sharedinc_rt",
                "windowed_int8_rt", "windowed_int8_steady_rt",
                "windowed_sharedinc_int8_rt", "train_step_ms_saunet_l_bs25",
                "protocol_tflops_effective", "pct_achievable_peak",
                "dp_train_step_ms", "sharded_windowed_rt"):
        assert key in out, (key, out)
    assert out["value"] > 0 and out["windowed_int8_rt"] > 0
