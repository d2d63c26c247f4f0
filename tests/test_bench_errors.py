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

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


@pytest.mark.slow          # spawns a fresh interpreter running bench.py
def test_backend_unavailable_emits_structured_error_json(tmp_path):
    record = tmp_path / "record.json"
    env = dict(os.environ, BENCH_FORCE_BACKEND_FAIL="1",
               BENCH_PROBE_ATTEMPTS="2", BENCH_PROBE_TIMEOUT_S="30",
               BENCH_RECORD_PATH=str(record))
    env.pop("BENCH_SMOKE", None)
    res = subprocess.run([sys.executable, BENCH], capture_output=True,
                         text=True, timeout=300, env=env)
    assert res.returncode == 0, res.stderr[-2000:]
    line = res.stdout.strip().splitlines()[-1]
    # the line must survive the driver's 2,000-char tail capture with
    # headroom (round 4's record was beheaded by its own length)
    assert len(line) < 1500, len(line)
    out = json.loads(line)
    assert out["error"] == "tpu_unavailable"
    assert out["metric"] == \
        "hcqt_saunet_xl_windowed_protocol_realtime_factor"
    assert out["value"] == 0.0 and out["vs_baseline"] == 0.0
    assert "rc=7" in out["error_detail"]          # attempts logged
    # prior-round context travels in a separate field, never as "value"
    assert out["last_known_good"]["windowed_f32_rt"] > 0
    # the FULL (untruncated) record landed in the record file
    full = json.loads(record.read_text())
    assert full["error"] == "tpu_unavailable"
    assert isinstance(full["error_detail"], list)
    assert len(full["error_detail"]) == 2         # both attempts, verbatim


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


def test_store_last_known_good_roundtrip(tmp_path, monkeypatch):
    """The LKG writer must preserve the full headline (int8 >= the f32
    rate it competed against) — asserted on a SYNTHETIC record through
    the real writer, not on the live file: the store policy deliberately
    keeps section-errored runs, so a legitimately stored run may carry a
    null windowed_int8_rt (ADVICE r4)."""
    sys.path.insert(0, REPO)
    import importlib

    bench = importlib.import_module("bench")
    path = tmp_path / "lkg.json"
    monkeypatch.setattr(bench, "_LKG_PATH", str(path))
    bench._store_last_known_good({
        "windowed_f32_rt": 42.2, "windowed_int8_rt": 46.5,
        "value": 46.5, "vs_baseline": 0.93,
        "headline_mode": "windowed_int8_per_recording",
    })
    lkg = json.loads(path.read_text())
    assert lkg["windowed_int8_rt"] == 46.5
    assert lkg["value"] >= lkg["windowed_f32_rt"]
    # a section-errored run stores too (a broken mode means the old
    # number is no longer "known good") — null int8 must round-trip
    bench._store_last_known_good({
        "windowed_f32_rt": 42.2, "windowed_int8_rt": None,
        "value": 42.2, "vs_baseline": 0.84,
    })
    lkg = json.loads(path.read_text())
    assert lkg["windowed_int8_rt"] is None and lkg["value"] == 42.2


def test_emit_line_fits_tail_capture(tmp_path, monkeypatch, capsys):
    """_emit must print ONE parseable JSON line < 1,500 chars even for a
    maximal success record (full embedded gate provenance, every mode,
    hardware-bound accounting), while the record FILE keeps everything —
    this is the invariant that was violated twice (r3: no line at all,
    r4: a 3.9 KB line beheaded by the driver's 2,000-char tail)."""
    sys.path.insert(0, REPO)
    import importlib

    bench = importlib.import_module("bench")
    record = tmp_path / "bench_record.json"
    monkeypatch.setenv("BENCH_RECORD_PATH", str(record))
    with open(os.path.join(REPO, "perf", "int8_gate_measured.json")) as f:
        gate = json.load(f)
    out = {
        "metric": "hcqt_saunet_xl_windowed_protocol_realtime_factor",
        "value": 46.5, "unit": "audio-sec/sec/chip", "vs_baseline": 0.93,
        "headline_mode": "windowed_int8_per_recording",
        "dense_serving_rt_cnn_family_only": 591.0,
        "windowed_sharedinc_rt": 38.4, "windowed_int8_rt": 46.5,
        "int8_accounting": "x" * 400, "int8_gate_measured": gate,
        "windowed_int8_steady_rt": 47.8,
        "windowed_sharedinc_int8_rt": 46.1, "windowed_f32_rt": 42.2,
        "protocol_tflops_effective": 166.7, "pct_achievable_peak": 103.5,
        "train_step_ms_saunet_l_bs25": 110.3,
        "train_step_tflops_effective": 55.0, "train_step_pct_peak": 34.2,
        "hardware_bound": {
            "needed_tflops_effective": 179.3,
            "chip_best_measured_matmul_tflops": 161.0,
            "achieved_tflops_effective": 166.7,
            "evidence": "y" * 300,
        },
        "sections_skipped_budget": ["dp_scaling"],
        "section_errors": {"dense": "ValueError: " + "z" * 250},
    }
    bench._emit(out)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(line) < 1500, len(line)
    compact = json.loads(line)
    # every number survives compaction; blobs become digests/pointers
    assert compact["value"] == 46.5
    assert compact["windowed_int8_rt"] == 46.5
    assert compact["train_step_tflops_effective"] == 55.0
    assert compact["int8_gate"]["all_passed"] is True
    assert compact["int8_gate"]["worst_drift"] <= 1e-3
    assert compact["int8_gate"]["detail"] == "perf/int8_gate_measured.json"
    assert "evidence" not in compact["hardware_bound"]
    assert compact["hardware_bound"]["needed_tflops_effective"] == 179.3
    assert compact["record"].endswith("bench_record.json")
    # the record file holds the FULL, untruncated payload
    full = json.loads(record.read_text())
    assert full["int8_gate_measured"] == gate
    assert full["hardware_bound"]["evidence"] == "y" * 300
    assert full["int8_accounting"] == "x" * 400


def test_forced_hooks_never_clobber_real_record(monkeypatch):
    """Without an explicit BENCH_RECORD_PATH, any BENCH_FORCE_* hook
    suppresses the record write — a forced-error test subprocess must
    not overwrite perf/bench_record.json from a real run."""
    sys.path.insert(0, REPO)
    import importlib

    bench = importlib.import_module("bench")
    monkeypatch.delenv("BENCH_RECORD_PATH", raising=False)
    monkeypatch.setenv("BENCH_FORCE_BACKEND_FAIL", "1")
    assert bench._record_path() is None
    monkeypatch.delenv("BENCH_FORCE_BACKEND_FAIL")
    monkeypatch.delenv("BENCH_SMOKE", raising=False)
    p = bench._record_path()
    assert p is not None and p.endswith(
        os.path.join("perf", "bench_record.json"))


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


@pytest.mark.slow          # spawns a fresh interpreter running bench.py
def test_primary_failure_still_emits_json():
    """Even a failure in the primary measurement path must leave ONE
    parseable JSON line (rc=0) instead of a bare traceback."""
    env = dict(os.environ, BENCH_FORCE_PRIMARY_FAIL="1",
               BENCH_PROBE_ATTEMPTS="1", BENCH_PROBE_TIMEOUT_S="120")
    env.pop("BENCH_SMOKE", None)
    env.pop("BENCH_RECORD_PATH", None)
    res = subprocess.run([sys.executable, BENCH], capture_output=True,
                         text=True, timeout=300, env=env)
    assert res.returncode == 0, res.stderr[-2000:]
    line = res.stdout.strip().splitlines()[-1]
    assert len(line) < 1500, len(line)     # fits the driver tail capture
    out = json.loads(line)
    assert out["error"] == "bench_failed"
    assert "forced primary failure" in out["error_detail"]
