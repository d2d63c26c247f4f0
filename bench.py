#!/usr/bin/env python
"""Benchmark: real-time factor of HCQT + SAUnet:XL inference on one chip.

Measures the full audio→prediction pipeline (matches the BASELINE.json
north star "≥50x real-time HCQT+SAUnet:XL inference per v5e chip with
F-measure within 1e-3"):

  1. synthesize AUDIO_SECONDS of 22.05 kHz audio;
  2. efficient 6-channel HCQT on device (multirate matmul CQT);
  3. SAUnet:XL (exp180e config, random weights — timing only) over every
     frame.

HEADLINE = the protocol-exact windowed mode (stride-1 windows, the
reference DataLoader's batch-50 attention composition, natural-size tail
batches), because it is the only mode that meets the F-gate for
cross-batch-attention checkpoints: a TRAINED SAUnet collapses under
dense inference (F 0.95→0.11, perf/dense_fparity_experiment.py) since
its attention was trained on batch-of-50-window token sets — and even
the attention-free U-Net drops to F 0.41 (window-geometry-dependent
pooling/up-concat/align_corners). The dense single-pass mode is
reported alongside; it is a serving mode for the plain CNN family only
(worst trained-model measure delta 2.6e-3,
perf/dense_fparity_conv_families.py).

The windowed mode fuses 250 windows per dispatch with block-diagonal
grouped attention ('cross_batch:50'), which reproduces the reference
batches exactly — see ops/attention.py.

Timing is honest for relayed backends: each pipeline is a chain of
jitted executables (one large scan + the protocol tail dispatches)
ending in a checksum whose value is fetched to the host — the fetch
syncs the whole dependency chain (block_until_ready can return at
enqueue through the TPU tunnel).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Record-vs-pipe split (VERDICT r4 task 1 — the round-4 record had rc=0
but was unparseable because the single stdout line grew to ~3.9 KB and
the driver stores only a 2,000-char tail, beheading the JSON): the FULL
record (embedded gate provenance, accounting prose, evidence strings)
is written to ``perf/bench_record.json``; the final stdout line is a
COMPACT summary hard-capped at ``_LINE_CAP`` (1,500) chars — enforced
by ``_emit`` in success and BOTH error modes, and asserted by
``tests/test_bench_errors.py`` — so it survives a tail capture with
headroom. ``BENCH_RECORD_PATH`` overrides the record path (tests point
it at tmp so forced-error subprocess runs never clobber the real
record).

Resilience (VERDICT r3 task 1 — a tunnel outage voided the round-3
record): backend init is probed in a bounded subprocess with retries
BEFORE any in-process jax work (an in-process ``jax.devices()`` against
a dead axon tunnel blocks >15 min in retry sleeps); on unrecoverable
failure ONE structured-error JSON line is still printed (``"error":
"tpu_unavailable"``) so the driver's record is never ``parsed: null``.
Secondary measurement sections record their exceptions in
``section_errors`` instead of silently dropping fields.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])

# Span = the duration of MuN-10 test recording 2382_Beethoven_OP130
# (117.701 s = max end_sample 5190622 / 44100 in the reference's shipped
# annotation data/MusicNet/csv/2382_….csv — the one MuN-10 test file
# whose ground truth is in the repo). The headline mode pays a
# per-recording calibration probe, so the real-time factor depends on
# recording length; anchoring the span to an actual protocol test
# recording makes the amortization representative rather than arbitrary
# (60 s, the old span, overstated the calibration cost ~2x).
AUDIO_SECONDS = 117.701
FS = 22050
BATCH = 250          # 5 reference test batches (50) fused per dispatch
GROUP = 50           # the reference test DataLoader batch size
TARGET_RT = 50.0
HALF = 37


def _probe_backend():
    """Bounded-subprocess backend probe with retry.

    Returns (ok, detail): ok=True once a child process can enumerate
    devices and run one tiny computation; detail is the per-attempt
    error log otherwise. Env hooks (used by tests/test_bench_errors.py):
    BENCH_PROBE_ATTEMPTS / BENCH_PROBE_TIMEOUT_S override the bounds;
    BENCH_FORCE_BACKEND_FAIL=1 makes every attempt fail."""
    attempts = int(os.environ.get("BENCH_PROBE_ATTEMPTS", "3"))
    # 240 s: the probe's tiny compile goes through the serialized
    # remote-compile service; measured 58 s with one busy CPU core and
    # 3x120 s false-negatived once while two host jobs were running
    timeout_s = float(os.environ.get("BENCH_PROBE_TIMEOUT_S", "240"))
    # BENCH_PROBE_PLATFORM pins the CHILD's jax platform (tests set
    # "cpu" so the suite's probe test never initializes the axon tunnel
    # — during an outage the unpinned probe would stall attempts×timeout
    # inside the CPU test suite); production leaves it unset so the
    # probe tests the real backend.
    plat = os.environ.get("BENCH_PROBE_PLATFORM")
    pin = (f"jax.config.update('jax_platforms', {plat!r}); " if plat
           else "")
    code = ("import jax; " + pin + "d = jax.devices(); "
            "import jax.numpy as jnp; "
            "print('OK', len(d), d[0].platform, "
            "float(jnp.ones((8, 8)).sum()))")
    if os.environ.get("BENCH_FORCE_BACKEND_FAIL") == "1":
        code = "import sys; sys.exit(7)"
    errs = []
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, timeout=timeout_s,
                               text=True)
            if r.returncode == 0 and r.stdout.strip().startswith("OK"):
                return True, r.stdout.strip().splitlines()[-1]
            errs.append(f"attempt {i + 1}: rc={r.returncode} "
                        + (r.stderr or "").strip()[-300:])
        except subprocess.TimeoutExpired:
            errs.append(f"attempt {i + 1}: no backend within {timeout_s:.0f}s"
                        " (tunnel init hang)")
    return False, errs


def _make_budget_check(smoke, bench_start, budget_s, skipped):
    """Budget gating with a paper trail: when a section is skipped
    because the wall-clock budget is tight (cold compile cache — each
    mode is a minutes-long XLA compile through the tunnel), its name is
    recorded in ``skipped`` and lands in the record as
    ``sections_skipped_budget``. Without this, a cold driver run would
    print a 42.1x f32-only record with no hint that the 46.5x int8
    HEADLINE mode was never attempted (observed: the round-4 fresh-boot
    run). Smoke mode never skips (the CPU smoke test must exercise
    every mode)."""

    def within(frac, name):
        if smoke or time.perf_counter() - bench_start < budget_s * frac:
            return True
        skipped.append(name)
        return False

    return within


def _make_guard(smoke, section_errors):
    """Secondary-section error recording: a real-run regression in a
    non-headline mode must surface as a ``section_errors`` entry in the
    record, never as a silently missing field. Smoke mode re-raises
    (the CPU smoke test must fail loudly); a BENCH_FORCE_SECTION_ERROR
    hook lets tests force the recording path in either mode."""

    def guard(name, fn, *args, **kwargs):
        if os.environ.get("BENCH_FORCE_SECTION_ERROR") == name:
            section_errors[name] = "forced error (test hook)"
            return None
        try:
            return fn(*args, **kwargs)
        except Exception as e:
            if smoke:
                raise
            section_errors[name] = f"{type(e).__name__}: {e}"[:300]
            return None

    return guard


_LKG_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "perf", "last_known_good.json")

# Hard cap for the final stdout line. The driver keeps a 2,000-char tail
# of stdout; 1,500 leaves headroom for stray warnings sharing the tail.
_LINE_CAP = 1500


def _record_path():
    """Where the FULL record goes. ``BENCH_RECORD_PATH`` overrides
    (tests route subprocess runs to tmp); any ``BENCH_FORCE_*`` hook
    without an explicit override suppresses the write entirely so a
    forced-error test run can never clobber the real run's record."""
    p = os.environ.get("BENCH_RECORD_PATH")
    if p:
        return p
    forced = any(k.startswith("BENCH_FORCE_") and os.environ[k]
                 for k in os.environ)
    if forced or os.environ.get("BENCH_SMOKE") == "1":
        return None
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "perf", "bench_record.json")


def _gate_digest(g):
    """Compact stand-in for the ~2 KB embedded gate provenance: row
    count, pass verdict, worst measured drift, pointer to the file."""
    if not isinstance(g, dict) or not isinstance(g.get("rows"), list):
        return {"error": str(g)[:120]}
    rows = g["rows"]
    drifts = [r.get("worst_of_25_measures_drift") for r in rows
              if isinstance(r.get("worst_of_25_measures_drift"),
                            (int, float))]
    return {"gate": g.get("gate"), "rows": len(rows),
            "all_passed": bool(rows) and all(r.get("passed")
                                             for r in rows),
            "worst_drift": max(drifts) if drifts else None,
            "detail": "perf/int8_gate_measured.json"}


def _compact_summary(out, saved):
    """The stdout view of the record: every number survives; prose
    blobs are replaced by digests/pointers into the full record file."""
    s = {}
    for k, v in out.items():
        if k == "int8_gate_measured":
            s["int8_gate"] = _gate_digest(v)
        elif k == "int8_accounting":
            continue                  # prose; lives in the record file
        elif k == "hardware_bound" and isinstance(v, dict):
            h = dict(v)
            h.pop("evidence", None)   # prose pointer; in the record file
            s[k] = h
        elif k == "last_known_good" and isinstance(v, dict):
            s[k] = {kk: vv for kk, vv in v.items() if kk != "source"}
        elif k == "error_detail":
            d = " | ".join(str(x) for x in v) if isinstance(v, list) \
                else str(v)
            s[k] = d if len(d) <= 400 else d[:397] + "..."
        else:
            s[k] = v
    if saved:
        s["record"] = saved
    return s


def _emit(out):
    """Single exit point for ALL bench outcomes: write the full record
    to disk, print one compact JSON line guaranteed <= _LINE_CAP chars
    (progressively dropping optional fields, core fields last-resort).
    The cap is what makes the driver record parseable — round 4's line
    grew past the driver's 2,000-char tail window and was beheaded."""
    path = _record_path()
    saved = None
    if path:
        try:
            with open(path, "w") as f:
                json.dump(out, f, indent=1)
                f.write("\n")
            rel = os.path.relpath(
                path, os.path.dirname(os.path.abspath(__file__)))
            saved = rel if not rel.startswith("..") else path
        except OSError:
            saved = None              # read-only checkout: line only
    line_obj = _compact_summary(out, saved)
    line = json.dumps(line_obj)
    for k in ("int8_gate", "section_errors", "sections_skipped_budget",
              "hardware_bound", "last_known_good", "error_detail",
              "dp_train_step_ms", "sharded_windowed_rt"):
        if len(line) <= _LINE_CAP:
            break
        line_obj.pop(k, None)
        line = json.dumps(line_obj)
    if len(line) > _LINE_CAP:         # unreachable by construction; belt
        core_keys = ("metric", "value", "unit", "vs_baseline", "error",
                     "record")
        line = json.dumps({k: line_obj[k] for k in core_keys
                           if k in line_obj})
    print(line)


def _store_last_known_good(out):
    """Refresh perf/last_known_good.json from a successful real run so
    the tpu_unavailable record's context is measured data, never
    hand-maintained prose constants (the same no-rot rule as
    _load_gate_provenance). Callers must NOT store budget-truncated
    runs: a cold-cache run that skipped the int8 headline section would
    downgrade the recorded best from 46.5x to the f32-only 42.1x
    (observed round 4) — budget skips are scheduling, not performance.
    Section *errors* do store: a genuinely broken mode means the old
    number is no longer 'known good'."""
    try:
        with open(_LKG_PATH, "w") as f:
            json.dump({
                "windowed_f32_rt": out.get("windowed_f32_rt"),
                "windowed_int8_rt": out.get("windowed_int8_rt"),
                "value": out["value"],
                "headline_mode": out.get("headline_mode"),
                "vs_baseline": out["vs_baseline"],
                "source": "last successful bench.py run on the real "
                          "chip (self-recorded)",
            }, f, indent=1)
            f.write("\n")
    except OSError:
        pass                       # read-only checkout: context is optional


def _load_last_known_good():
    try:
        with open(_LKG_PATH) as f:
            return json.load(f)
    except Exception:
        return {"error": "no prior successful run recorded "
                         "(perf/last_known_good.json missing/corrupt)"}


def _load_gate_provenance():
    """Structured int8-gate evidence stamped from the measurement log
    (perf/int8_gate_measured.json, regenerated by
    perf/gated_mode_experiment.py) — data, not prose, so a policy or
    checkpoint change can't silently rot the recorded claim."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "perf", "int8_gate_measured.json")
    try:
        with open(path) as f:
            g = json.load(f)
        g.pop("comment", None)
        return g
    except Exception as e:          # missing/corrupt file is itself a record
        return {"error": f"gate provenance unavailable: {e!r}"}


def main():
    # BENCH_SMOKE=1: full bench FLOW on CPU with a tiny model and 3 s of
    # audio — exercises every mode (windowed/dense/shared-inc/int8/train
    # step) so a bench.py regression is caught by the test suite instead
    # of surfacing as a silent mode drop at the one consequential run on
    # the real chip. Numbers are meaningless in smoke mode; guarded
    # sections re-raise instead of being skipped.
    smoke = os.environ.get("BENCH_SMOKE") == "1"

    if os.environ.get("BENCH_FORCE_PRIMARY_FAIL") == "1":
        raise RuntimeError("forced primary failure (test hook)")

    # probe the backend in a bounded subprocess BEFORE touching jax in
    # this process: if the tunnel is down, emit a structured-error record
    # instead of hanging or dying with rc!=0 (round-3's record was voided
    # exactly this way). Smoke mode pins CPU and needs no probe.
    if not smoke:
        ok, detail = _probe_backend()
        if not ok:
            _emit({
                "metric": "hcqt_saunet_xl_windowed_protocol_realtime_factor",
                "value": 0.0,
                "unit": "audio-sec/sec/chip",
                "vs_baseline": 0.0,
                "error": "tpu_unavailable",
                "error_detail": detail,
                "last_known_good": _load_last_known_good(),
            })
            return

    import jax

    global AUDIO_SECONDS, BATCH, GROUP
    if smoke:
        jax.config.update("jax_platforms", "cpu")
        AUDIO_SECONDS, BATCH, GROUP = 3.0, 20, 10

    section_errors = {}
    guard = _make_guard(smoke, section_errors)

    # persistent compilation cache: repeat bench invocations skip the
    # (minutes-long, tunnel-bound) XLA compiles
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/multipitch_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from multipitch_architectures_tpu.data.windows import gather_windows
    from multipitch_architectures_tpu.dsp.hcqt import efficient_hcqt_device
    from multipitch_architectures_tpu.experiments import load_experiment

    t = np.arange(int(AUDIO_SECONDS * FS)) / FS
    audio = sum((1.0 / h) * np.sin(2 * np.pi * 261.63 * h * t)
                for h in (1, 2, 3, 4, 5)).astype(np.float32)
    audio_dev = jnp.asarray(audio)

    if smoke:
        from multipitch_architectures_tpu.models import (
            SimpleUNetDoubleSelfAttn)

        model = SimpleUNetDoubleSelfAttn(
            n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
            embed_dim=32, num_heads=8, mlp_dim=64,
            pos_encoding="sinusoidal")
    else:
        cfg = load_experiment(
            "exp180e_musicnet_unet_insanelylarge_doubleselfattn")
        model = cfg.build_model()
    # protocol-exact windowed variant: convs fused over BATCH windows per
    # dispatch while attention stays block-diagonal in groups of 50 — the
    # reference test loader's exact batch composition (exp180e…py:62-65)
    import dataclasses

    model_grouped = dataclasses.replace(model,
                                        attn_mode=f"cross_batch:{GROUP}")
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 6, 75, 216), jnp.float32),
                           train=False)

    def features(audio):
        f, _, _ = efficient_hcqt_device(
            audio, fs=FS, fs_hcqt_target=50, bins_per_octave=36,
            num_octaves=6, tuning=0.0)
        x = jnp.log1p(10.0 * f)
        return jnp.pad(x, ((0, 0), (HALF, HALF + 1), (0, 0)))

    n_frames = int(len(audio) // 512) + 1
    n_full = (n_frames // BATCH) * BATCH
    centers_mat = jnp.asarray(
        (HALF + np.arange(n_full)).reshape(n_full // BATCH, BATCH))
    # protocol tail: remaining full 50-groups, then the natural-size
    # remainder (its own short reference batch)
    tail_chunks = []
    start = n_full
    while start < n_frames:
        n = min(GROUP, n_frames - start)
        tail_chunks.append(jnp.asarray(HALF + start + np.arange(n)))
        start += n

    @jax.jit
    def dense_pipeline(variables, audio):
        xp = features(audio)[None]
        y = model.apply(variables, xp, train=False)
        return jnp.sum(y.astype(jnp.float32))

    def make_windowed(apply_batch):
        """Full windowed-protocol pipeline for any batched window
        forward, as ONE jitted executable (the scanned full batches AND
        the protocol tail batches inside a single dispatch — per-dispatch
        enqueue through the relayed TPU backend costs tens of ms, so
        separate tail executables taxed every mode ~5%). Every mode is
        measured over the SAME audio span (all n_frames, tails included)
        so real-time factors are directly comparable."""

        @jax.jit
        def full(variables, audio):
            xp = features(audio)

            def body(acc, centers):
                xw = gather_windows(xp, centers, 75)
                y = apply_batch(variables, xw)
                return acc + jnp.sum(y.astype(jnp.float32)), None

            total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                    centers_mat)
            for c in tail_chunks:               # static shapes, same exe
                y = apply_batch(variables, gather_windows(xp, c, 75))
                total = total + jnp.sum(y.astype(jnp.float32))
            return total

        return full

    def make_windowed_shared(fwd):
        """Windowed protocol with the shared-``inc`` forward
        (eval/shared_inc.py): dense LayerNorm+inc once per recording,
        interior rows reused across all windows, exact edge rows —
        single-dispatch structure and audio span as make_windowed."""

        @jax.jit
        def full(variables, audio):
            xp = features(audio)
            ln_dense, inc_dense = fwd._precompute_impl(variables, xp)

            def body(acc, centers):
                y = fwd._forward_impl(variables, ln_dense, inc_dense,
                                      centers)
                return acc + jnp.sum(y.astype(jnp.float32)), None

            total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                    centers_mat)
            for c in tail_chunks:
                y = fwd._forward_impl(variables, ln_dense, inc_dense, c)
                total = total + jnp.sum(y.astype(jnp.float32))
            return total

        return full

    windowed_full = make_windowed(
        lambda v, xw: model_grouped.apply(v, xw, train=False))

    def timed_rt(fn, *args, reps=3):
        float(fn(*args))                       # warm-up / compile
        best = min(_timed(fn, *args) for _ in range(reps))
        return AUDIO_SECONDS / best

    def _timed(fn, *args):
        t0 = time.perf_counter()
        float(fn(*args))                       # host fetch = honest sync
        return time.perf_counter() - t0

    bench_start = time.perf_counter()
    windowed_rt = timed_rt(windowed_full, variables, audio_dev)

    # the secondary (dense serving-mode) measurement compiles a second
    # large executable; skip it when close to the time budget so the
    # primary line always prints (cached runs easily fit)
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    skipped = []
    within_budget = _make_budget_check(smoke, bench_start, budget_s,
                                       skipped)
    dense_rt = None
    if within_budget(0.5, "dense"):
        dense_rt = guard("dense", timed_rt, dense_pipeline, variables,
                         audio_dev)

    out = {
        "metric": "hcqt_saunet_xl_windowed_protocol_realtime_factor",
        "value": round(windowed_rt, 1),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(windowed_rt / TARGET_RT, 3),
    }
    if dense_rt is not None:
        # F-gate-compliant for the plain CNN family only (see module
        # docstring); U-Nets and attention models must use windowed
        out["dense_serving_rt_cnn_family_only"] = round(dense_rt, 1)

    # the shared-inc f32 mode is float-reassociation-exact vs the
    # protocol (tests/test_eval.py::test_shared_inc_matches_windowed_
    # protocol), so it competes for the headline directly
    if within_budget(0.45, "sharedinc"):
        def _sharedinc_section():
            from multipitch_architectures_tpu.eval import SharedIncForward

            fwd_f32 = SharedIncForward(model_grouped)
            rt = timed_rt(make_windowed_shared(fwd_f32), variables,
                          audio_dev)
            out["windowed_sharedinc_rt"] = round(rt, 1)
            if rt > out["value"] and not smoke:
                out["value"] = round(rt, 1)
                out["vs_baseline"] = round(rt / TARGET_RT, 3)
                out["headline_mode"] = "windowed_sharedinc"

        guard("sharedinc", _sharedinc_section)

    # calibrated static-scale int8 serving mode: same windowed protocol
    # composition, conv arithmetic in W8A8 (eval/quant.py). Per-tensor
    # scales calibrated on the first 4 protocol batches of the recording
    # being served (per-recording calibration, predict_framewise_int8's
    # exact policy). The calibration pass is INSIDE the timed
    # executable — per-recording means it is paid per served recording —
    # and, as in the serving call, its exact-f32 outputs ARE the
    # predictions for the calibration span (reuse_cal_predictions), so
    # calibration costs one probe rather than an extra 8% of window
    # work. Gate evidence (perf/gated_mode_experiment.py, trained
    # checkpoints): this policy's worst-of-25-measures drift on the
    # HEADLINE (SAUnet) family = 6.5e-4 PASS (the reused f32 span can
    # only shrink that) — it satisfies BASELINE's "F within 1e-3"
    # condition for the SAUnet:XL metric this bench reports, so the
    # mode competes for the headline. Quantization fitness is
    # per-checkpoint: the PUnet family misses uniform static int8
    # (1.2-1.8e-3; per-channel/margins don't fix it) and uses
    # eval.auto_hybrid_int8 — the export CLI enforces/repairs the gate
    # per checkpoint (int8_drift_report / --int8-hybrid).
    if within_budget(0.6, "int8"):
        def _int8_primary():
            import flax.linen as nn

            from multipitch_architectures_tpu.eval import (
                make_int8_interceptor)
            from multipitch_architectures_tpu.eval.quant import _probe_for

            N_CAL = 4                       # serving-call default policy
            cal_centers = jnp.asarray(HALF + np.arange(N_CAL * GROUP))
            rest0 = N_CAL * GROUP
            n_rest_full = ((n_frames - rest0) // BATCH) * BATCH
            rest_mat = jnp.asarray(
                (HALF + rest0 + np.arange(n_rest_full)).reshape(-1, BATCH))
            rest_tails = []
            start = rest0 + n_rest_full
            while start < n_frames:
                n = min(GROUP, n_frames - start)
                rest_tails.append(jnp.asarray(HALF + start + np.arange(n)))
                start += n

            probe = _probe_for(model_grouped, 4096, None, False, True)

            @jax.jit
            def int8_serve(variables, audio):
                xp = features(audio)
                # calibration = one exact-f32 grouped forward, capturing
                # per-conv max|x|; its outputs serve the first 200 frames
                (y_cal, _), captured = probe.jit(
                    variables, gather_windows(xp, cal_centers, 75))
                scales = {k: jnp.maximum(v, 1e-12) / 127.0
                          for k, v in zip(list(probe.keys), captured)}
                interceptor = make_int8_interceptor(4096, scales)

                def apply_q(v, xw):
                    with nn.intercept_methods(interceptor):
                        return model_grouped.apply(v, xw, train=False)

                def body(acc, centers):
                    y = apply_q(variables, gather_windows(xp, centers, 75))
                    return acc + jnp.sum(y.astype(jnp.float32)), None

                total, _ = jax.lax.scan(
                    body, jnp.sum(y_cal.astype(jnp.float32)), rest_mat)
                for c in rest_tails:
                    y = apply_q(variables, gather_windows(xp, c, 75))
                    total = total + jnp.sum(y.astype(jnp.float32))
                return total

            int8_rt = timed_rt(int8_serve, variables, audio_dev)
            out["windowed_int8_rt"] = round(int8_rt, 1)
            if int8_rt > out["value"] and not smoke:
                out["value"] = round(int8_rt, 1)
                out["vs_baseline"] = round(int8_rt / TARGET_RT, 3)
                out["headline_mode"] = "windowed_int8_per_recording"
                out["int8_accounting"] = (
                    "per-recording calibration probe inside the timed "
                    "executable; its f32 outputs serve the calibration "
                    "span (reuse_cal_predictions), int8 serves the rest "
                    "— same audio span as every other mode")
                out["int8_gate_measured"] = _load_gate_provenance()

        guard("int8", _int8_primary)

        # steady-state (calibration excluded, whole span int8): the
        # round-2/3 cross-round comparable; also feeds shared-inc.
        # Secondary records — only when the budget clearly allows.
        def _int8_secondary():
            from multipitch_architectures_tpu.eval import (
                SharedIncForward, calibrate_activation_scales,
                quantized_apply_fn)

            N_CAL = 4
            xp_cal = features(audio_dev)
            cal = [gather_windows(xp_cal, HALF + GROUP * b
                                  + np.arange(GROUP), 75)
                   for b in range(N_CAL)]
            scales = calibrate_activation_scales(model_grouped, variables,
                                                 cal)
            int8_apply = quantized_apply_fn(model_grouped,
                                            activation_scales=scales)
            out["windowed_int8_steady_rt"] = round(
                timed_rt(make_windowed(int8_apply), variables, audio_dev),
                1)
            fwd_q = SharedIncForward(model_grouped,
                                     activation_scales=scales)
            out["windowed_sharedinc_int8_rt"] = round(
                timed_rt(make_windowed_shared(fwd_q), variables,
                         audio_dev), 1)

        if within_budget(0.7, "int8_secondary"):
            guard("int8_secondary", _int8_secondary)
    else:
        skipped.append("int8_secondary")   # nested in the skipped block
    out["windowed_f32_rt"] = round(windowed_rt, 1)

    # speed-of-light accounting for the record (ROADMAP r2 analysis:
    # the full protocol costs 83.25 GFLOP/window; a bare 8192^3 jnp.dot
    # achieves 161 TFLOP/s on this v5e = the practical chip peak).
    # "effective" = protocol FLOPs per wall second for the HEADLINE mode
    # — int8 executes the same protocol ops at lower precision, and
    # shared-inc EXECUTES ~6% fewer FLOPs for the same protocol output,
    # so the effective rate may exceed the chip's dense-matmul rate.
    best_rt = out["value"]
    gflop_per_window = 83.25
    frames_per_sec_audio = FS / 512.0
    out["protocol_tflops_effective"] = round(
        best_rt * frames_per_sec_audio * gflop_per_window / 1e3, 1)
    out["pct_achievable_peak"] = round(
        100.0 * out["protocol_tflops_effective"] / 161.0, 1)

    # training throughput anchor, re-measured every run: SAUnet:L
    # (exp180d) train step, batch 25, incl. loss/grad/optimizer — the
    # reference trains this at ~12 min/MusicNet-epoch on its cluster GPU
    # (SURVEY §6); 25 windows/step ⇒ epoch minutes = steps × ms / 60e3.
    if within_budget(0.7, "train_step"):
        def _train_section():
            ms, flops = _train_step_ms(jax, model=model if smoke else None)
            out["train_step_ms_saunet_l_bs25"] = ms
            # auditable efficiency accounting for the training claim,
            # mirroring the inference side (VERDICT r4 task 7): FLOPs
            # from XLA's own cost model on the compiled fwd+bwd+update
            # executable, rate vs the chip's best measured matmul rate.
            if flops:
                tflops = round(flops / (ms * 1e9), 1)
                out["train_step_tflops_effective"] = tflops
                out["train_step_pct_peak"] = round(
                    100.0 * tflops / 161.0, 1)

        guard("train_step", _train_section)

    # multi-chip DP scaling evidence: only when real chips allow it
    # (single-chip anchor: SAUnet:L train step bs=25 = 114.9 ms, ROADMAP).
    # Smoke mode exercises both paths on the inherited virtual CPU mesh.
    if len(jax.devices()) > 1 and within_budget(0.75, "dp_scaling"):
        def _dp_section():
            out["dp_train_step_ms"] = _dp_step_scaling(
                jax, model=model if smoke else None)

        def _sharded_section():
            out["sharded_windowed_rt"] = _sharded_inference_scaling(
                jax, model_grouped, variables, audio_dev, features)

        guard("dp_scaling", _dp_section)
        guard("sharded_inference", _sharded_section)

    # the 50x north-star clause answered by the record itself (VERDICT r3
    # task 2): every FLOP-cutting route has been measured dead (int8 MXU
    # rate = bf16 rate on this chip, shared-inc slower, dense breaks the
    # F-gate, bf16 slower — ROADMAP.md "hardware-bound" section), so a
    # sub-50x headline is a measured chip bound, not unfinished work.
    if not smoke and out["value"] < TARGET_RT:
        out["hardware_bound"] = {
            "needed_tflops_effective": round(
                TARGET_RT * frames_per_sec_audio * gflop_per_window / 1e3,
                1),
            "chip_best_measured_matmul_tflops": 161.0,
            "achieved_tflops_effective": out["protocol_tflops_effective"],
            "evidence": "perf/pallas_int8_matmul_probe.py (int8 MXU rate "
                        "= bf16 rate), eval/shared_inc.py measured 8% "
                        "slower, dense mode breaks the F-gate for U-Nets "
                        "(perf/dense_fparity_experiment.py), tail packing "
                        "5.26% slower (perf/results_r4_tail_packing.txt), "
                        "scan rows >250 dead end-to-end "
                        "(perf/results_r5_scan_rows.txt); ROADMAP.md",
            "all_flop_cutting_routes_measured": True,
        }
    if skipped:
        out["sections_skipped_budget"] = skipped
    if section_errors:
        out["section_errors"] = section_errors
    # budget-truncated runs never overwrite the last-known-good context
    # (see _store_last_known_good); section errors still store. Only
    # skips of HEADLINE-COMPETING sections block storage — informational
    # sections (dense, train_step, dp_scaling, int8_secondary) never
    # affect out["value"], so skipping them is scheduling, not a weaker
    # measurement (ADVICE r4).
    headline_skipped = {"sharedinc", "int8"} & set(skipped)
    if not smoke and out.get("value", 0) > 0 and not headline_skipped:
        _store_last_known_good(out)
    _emit(out)


def _sharded_inference_scaling(jax, model_grouped, variables, audio_dev,
                               features):
    """Windowed-protocol real-time factor at mesh sizes {1, N}: the
    stride-1 window fan-out sharded over the data axis
    (eval.predict_framewise_sharded), 250 windows/chip/dispatch in
    reference-exact groups of 50. Ideal scaling: rt[N] ≈ N·rt[1]."""
    import jax.numpy as jnp

    from multipitch_architectures_tpu.eval import predict_framewise_sharded
    from multipitch_architectures_tpu.parallel import make_mesh

    hcqt = features(audio_dev)[:, HALF:-(HALF + 1), :]   # unpad: raw (6,T,F)
    apply_fn = lambda v, xw: model_grouped.apply(v, xw, train=False)
    result = {}
    for n_dev in (1, len(jax.devices())):
        mesh = make_mesh(n_dev)
        run = lambda: predict_framewise_sharded(
            apply_fn, variables, hcqt, mesh, per_device_batch=BATCH,
            compression=None, group=GROUP)
        run()                                            # warm-up
        t0 = time.perf_counter()
        run()
        result[str(n_dev)] = round(
            AUDIO_SECONDS / (time.perf_counter() - t0), 1)
    return result


def _train_step_ms(jax, model=None):
    """Single-chip SAUnet:L (exp180d config) train-step time, batch 25:
    jitted loss+grad+optimizer update, median-of-5 after compile, honest
    host-fetch sync. ``model`` overrides the flagship config (smoke
    mode's tiny model).

    Returns ``(ms, flops)``: ``flops`` is XLA's own cost-model estimate
    for the compiled step executable (fwd+bwd+optimizer at bs=25), or
    ``None`` where the backend exposes no cost analysis — it feeds the
    ``train_step_tflops_effective`` accounting in the record."""
    import jax.numpy as jnp

    from multipitch_architectures_tpu.experiments import load_experiment
    from multipitch_architectures_tpu.train import Trainer, TrainConfig

    if model is None:
        cfg = load_experiment(
            "exp180d_musicnet_unet_extremelylarge_doubleselfattn")
        model = cfg.build_model()
    tr = Trainer(model, TrainConfig(max_epochs=1, batch_size=25,
                                    loss="bce"))
    state = tr.init(jnp.zeros((1, 6, 75, 216)))
    x = jnp.zeros((25, 6, 75, 216), jnp.float32)
    y = jnp.zeros((25, 1, 1, 72), jnp.float32)
    xs, ys, ws = tr._shard(x, y)
    key = jax.random.PRNGKey(0)
    flops = None
    try:
        # lower BEFORE the first call (_train_step donates the state
        # buffers; lowering never consumes them) and take the
        # LOWERING-level cost analysis: no backend compile (a second
        # multi-minute tunnel compile of the same program), and the
        # unoptimized-HLO FLOP count is the analytic work-in-program
        # number, comparable to the inference side's 83.25 GFLOP/window.
        # NB the jit wrapper's .lower does not bind self (static arg 0).
        ca = tr._train_step.lower(tr, state, xs, ys, ws,
                                  key).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    state, loss = tr._train_step(state, xs, ys, ws, key)       # compile
    float(loss)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        state, loss = tr._train_step(state, xs, ys, ws, key)
        float(loss)
        times.append(time.perf_counter() - t0)
    return round(sorted(times)[2] * 1e3, 1), flops


def _dp_step_scaling(jax, model=None):
    """Train-step time per mesh size {1, N} on real chips: SAUnet:L
    (exp180d config), global batch 25 per chip — reports ms/step so the
    scaling efficiency is step_ms[1]/step_ms[N] (ideal: ~1.0 at constant
    per-chip batch). ``model`` overrides the flagship config (smoke)."""
    import jax.numpy as jnp

    from multipitch_architectures_tpu.experiments import load_experiment
    from multipitch_architectures_tpu.parallel import make_mesh
    from multipitch_architectures_tpu.train import Trainer, TrainConfig

    if model is None:
        cfg = load_experiment(
            "exp180d_musicnet_unet_extremelylarge_doubleselfattn")
        model = cfg.build_model()
    result = {}
    n = len(jax.devices())
    for n_dev in (1, n):
        mesh = make_mesh(n_dev)
        bs = 25 * n_dev
        tr = Trainer(model, TrainConfig(max_epochs=1, batch_size=bs,
                                        loss="bce"), mesh=mesh)
        state = tr.init(jnp.zeros((1, 6, 75, 216)))
        x = jnp.zeros((bs, 6, 75, 216), jnp.float32)
        y = jnp.zeros((bs, 1, 1, 72), jnp.float32)
        xs, ys, ws = tr._shard(x, y)
        key = jax.random.PRNGKey(0)
        state, loss = tr._train_step(state, xs, ys, ws, key)   # compile
        float(loss)
        t0 = time.perf_counter()
        for _ in range(5):
            state, loss = tr._train_step(state, xs, ys, ws, key)
        float(loss)
        result[str(n_dev)] = round((time.perf_counter() - t0) / 5 * 1e3, 1)
    return result


if __name__ == "__main__":
    try:
        main()
    except Exception:
        # last-resort record: even a primary-measurement failure must
        # leave ONE parseable JSON line (smoke mode re-raises — the CPU
        # smoke test must fail loudly)
        if os.environ.get("BENCH_SMOKE") == "1":
            raise
        import traceback

        _emit({
            "metric": "hcqt_saunet_xl_windowed_protocol_realtime_factor",
            "value": 0.0,
            "unit": "audio-sec/sec/chip",
            "vs_baseline": 0.0,
            "error": "bench_failed",
            "error_detail":
                traceback.format_exc().strip().splitlines()[-4:],
        })
