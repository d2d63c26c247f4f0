"""bench.py resilience (VERDICT r3 task 1): the round-3 driver record
was voided because a TPU-tunnel outage made bench.py die at backend init
with rc=1 and no JSON. These tests force both failure paths cheaply:

- backend unavailable → ONE structured-error JSON line, rc=0 (never
  ``parsed: null`` in the driver record);
- a secondary measurement section failing on a real (non-smoke) run →
  recorded in ``section_errors`` instead of silently dropping fields.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def test_backend_unavailable_emits_structured_error_json():
    env = dict(os.environ, BENCH_FORCE_BACKEND_FAIL="1",
               BENCH_PROBE_ATTEMPTS="2", BENCH_PROBE_TIMEOUT_S="30")
    env.pop("BENCH_SMOKE", None)
    res = subprocess.run([sys.executable, BENCH], capture_output=True,
                         text=True, timeout=300, env=env)
    assert res.returncode == 0, res.stderr[-2000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["error"] == "tpu_unavailable"
    assert out["metric"] == \
        "hcqt_saunet_xl_windowed_protocol_realtime_factor"
    assert out["value"] == 0.0 and out["vs_baseline"] == 0.0
    assert len(out["error_detail"]) == 2          # both attempts logged
    assert "rc=7" in out["error_detail"][0]
    # prior-round context travels in a separate field, never as "value"
    assert out["last_known_good"]["windowed_f32_rt"] > 0


def test_probe_retries_and_succeeds_within_attempts():
    """The probe itself must succeed against a live (CPU-pinned) child
    interpreter — guards against the probe code string rotting. The
    child is pinned to CPU (BENCH_PROBE_PLATFORM): unpinned it would
    initialize the real axon tunnel from inside the CPU suite and stall
    attempts x timeout during exactly the outage bench.py now
    survives."""
    sys.path.insert(0, REPO)
    import importlib

    bench = importlib.import_module("bench")
    os.environ.update(BENCH_PROBE_PLATFORM="cpu",
                      BENCH_PROBE_ATTEMPTS="2",
                      BENCH_PROBE_TIMEOUT_S="120")
    try:
        ok, detail = bench._probe_backend()
    finally:
        for k in ("BENCH_PROBE_PLATFORM", "BENCH_PROBE_ATTEMPTS",
                  "BENCH_PROBE_TIMEOUT_S"):
            os.environ.pop(k, None)
    assert ok, detail
    assert detail.startswith("OK")
    assert " cpu " in detail            # the pin reached the child


def test_section_guard_records_instead_of_dropping():
    """Non-smoke: a section exception lands in section_errors verbatim;
    the forced-error hook takes the same recording path; smoke re-raises
    real errors (the CPU smoke test must fail loudly)."""
    sys.path.insert(0, REPO)
    import importlib

    import pytest

    bench = importlib.import_module("bench")

    errs = {}
    guard = bench._make_guard(smoke=False, section_errors=errs)

    def boom():
        raise ValueError("mode regression")

    assert guard("dense", boom) is None
    assert errs["dense"] == "ValueError: mode regression"
    assert guard("ok", lambda: 41 + 1) == 42

    os.environ["BENCH_FORCE_SECTION_ERROR"] = "int8"
    try:
        assert guard("int8", lambda: 1) is None
        assert errs["int8"] == "forced error (test hook)"
    finally:
        del os.environ["BENCH_FORCE_SECTION_ERROR"]

    guard_smoke = bench._make_guard(smoke=True, section_errors={})
    with pytest.raises(ValueError):
        guard_smoke("dense", boom)


def test_budget_skips_are_recorded_and_never_stored_as_lkg():
    """A tight wall-clock budget (cold compile cache) skips secondary
    sections — the skip must be visible in the record
    (``sections_skipped_budget``) and a truncated run must never
    overwrite perf/last_known_good.json (observed round 4: a fresh-boot
    cold run downgraded the stored best from the 46.5x int8 headline to
    the f32-only 42.1x)."""
    sys.path.insert(0, REPO)
    import importlib
    import time

    bench = importlib.import_module("bench")

    # exhausted budget: every section skipped, in order, by name
    skipped = []
    within = bench._make_budget_check(
        smoke=False, bench_start=time.perf_counter() - 100.0,
        budget_s=10.0, skipped=skipped)
    assert not within(0.5, "dense") and not within(0.6, "int8")
    assert skipped == ["dense", "int8"]

    # generous budget: nothing skipped
    ok = []
    within = bench._make_budget_check(
        smoke=False, bench_start=time.perf_counter(), budget_s=1e9,
        skipped=ok)
    assert within(0.5, "dense") and ok == []

    # smoke mode never skips even with a dead budget
    smoke_skips = []
    within = bench._make_budget_check(
        smoke=True, bench_start=time.perf_counter() - 100.0,
        budget_s=0.0, skipped=smoke_skips)
    assert within(0.5, "dense") and smoke_skips == []

    # the LKG file itself must carry the full (non-truncated) headline:
    # int8 present and >= the f32 rate it competes against
    with open(os.path.join(REPO, "perf", "last_known_good.json")) as f:
        lkg = json.load(f)
    assert lkg["windowed_int8_rt"] is not None
    assert lkg["value"] >= lkg["windowed_f32_rt"]


def test_gate_provenance_is_structured_and_current():
    """The int8 gate claim embedded in the bench record must come from
    the committed measurement JSON (perf/int8_gate_measured.json), not
    prose constants — and that JSON must carry a passing headline row
    with a source pointer (VERDICT r3 task 4)."""
    sys.path.insert(0, REPO)
    import importlib

    bench = importlib.import_module("bench")
    g = bench._load_gate_provenance()
    assert "error" not in g, g
    assert g["gate"] == 1e-3
    rows = {r["family"]: r for r in g["rows"]}
    head = rows["SAUnet (headline)"]
    assert head["passed"] and head["worst_of_25_measures_drift"] <= 1e-3
    assert os.path.exists(os.path.join(
        REPO, head["source"].split(" ")[0]))


def test_primary_failure_still_emits_json():
    """Even a failure in the primary measurement path must leave ONE
    parseable JSON line (rc=0) instead of a bare traceback."""
    env = dict(os.environ, BENCH_FORCE_PRIMARY_FAIL="1",
               BENCH_PROBE_ATTEMPTS="1", BENCH_PROBE_TIMEOUT_S="120")
    env.pop("BENCH_SMOKE", None)
    res = subprocess.run([sys.executable, BENCH], capture_output=True,
                         text=True, timeout=300, env=env)
    assert res.returncode == 0, res.stderr[-2000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["error"] == "bench_failed"
    assert any("forced primary failure" in line
               for line in out["error_detail"])
