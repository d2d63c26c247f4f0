#!/usr/bin/env python
"""Scan-row (dispatch batch) size sweep beyond 250 (VERDICT r4 task 2).

The round-4 per-dispatch curve (perf/results_r4_tail_packing.txt) was
still improving at its last point (914 → 640 us/window from B=200 →
250) — the one unmeasured stone left on the 50x question. This script
extends the curve to B in {250, 500, 750, 1000} windows per dispatch,
keeping the reference test loader's 50-window attention groups intact
(``cross_batch:50`` block-diagonal attention — composition-exact by the
same argument as tail packing: windows in different 50-groups never
attend to each other, so batching more groups per dispatch changes
scheduling, not math). Reference protocol being matched:
exp180d…py:427-443.

Measures, on the real chip, over the bench-anchored 117.701-s span:
  1. per-window dispatch time vs B, f32 AND steady-state int8
     (calibrated static scales, eval/quant.py);
  2. end-to-end windowed RT (scan rows of B + protocol tail batches,
     ONE jitted executable — bench.py's exact pipeline shape) for
     B=250 (baseline) and any B whose per-dispatch curve improved,
     f32 and steady int8, plus the per-recording gated int8 headline
     mode for the best B.

If a larger B wins end-to-end, bench.py's BATCH should be raised; if it
loses, the hardware-bound file gains its last row and every
protocol-exact route to 50x has been measured.

Run: python perf/scan_row_sweep.py [--smoke]   (--smoke: tiny CPU check)
Result: perf/results_r5_scan_rows.txt
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

AUDIO_SECONDS = 117.701          # bench.py anchored span (MuN-10 2382)
FS = 22050
GROUP = 50
HALF = 37
SWEEP = (250, 500, 750, 1000)


def main():
    global AUDIO_SECONDS, GROUP, SWEEP
    smoke = "--smoke" in sys.argv
    import jax

    if smoke:
        jax.config.update("jax_platforms", "cpu")
        AUDIO_SECONDS, GROUP, SWEEP = 3.0, 10, (20, 40)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/multipitch_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses

    import jax.numpy as jnp

    from multipitch_architectures_tpu.data.windows import gather_windows
    from multipitch_architectures_tpu.dsp.hcqt import efficient_hcqt_device
    from multipitch_architectures_tpu.eval import (
        calibrate_activation_scales, quantized_apply_fn)
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
        model = load_experiment(
            "exp180e_musicnet_unet_insanelylarge_doubleselfattn"
        ).build_model()
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
    print(f"span {AUDIO_SECONDS:.3f} s = {n_frames} frames")

    apply_f32 = lambda v, xw: model_grouped.apply(v, xw, train=False)

    # steady-state int8: calibrated static scales (bench.py's
    # windowed_int8_steady_rt policy — the right comparator for pure
    # dispatch efficiency; the per-recording headline adds a constant
    # calibration probe that is independent of B)
    xp_cal = features(audio_dev)
    cal = [gather_windows(xp_cal, HALF + GROUP * b + np.arange(GROUP), 75)
           for b in range(4)]
    scales = calibrate_activation_scales(model_grouped, variables, cal)
    apply_int8 = quantized_apply_fn(model_grouped,
                                    activation_scales=scales)

    def timed(fn, *args, reps=3):
        float(fn(*args))                         # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))                     # host fetch = sync
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # ---- 1. per-window dispatch-time curve, f32 and int8 -------------
    xp_host = features(audio_dev)
    results = {}
    print("\nper-dispatch time vs batch size (groups of "
          f"{GROUP} intact):")
    print(f"  {'B':>5s} {'f32 ms':>9s} {'f32 us/w':>9s} "
          f"{'int8 ms':>9s} {'int8 us/w':>10s}")
    for b in SWEEP:
        if b > n_frames:
            print(f"  B={b}: skipped (span has only {n_frames} frames)")
            continue
        centers = jnp.asarray(HALF + np.arange(b))
        row = {}
        for name, ap in (("f32", apply_f32), ("int8", apply_int8)):
            @jax.jit
            def one(variables, xp, centers=centers, ap=ap):
                y = ap(variables, gather_windows(xp, centers, 75))
                return jnp.sum(y.astype(jnp.float32))

            try:
                row[name] = timed(one, variables, xp_host)
            except Exception as e:               # OOM at large B is data
                row[name] = None
                row[name + "_err"] = f"{type(e).__name__}: {e}"[:120]
        results[b] = row
        f32s = (f"{row['f32'] * 1e3:9.2f} {row['f32'] / b * 1e6:9.1f}"
                if row.get("f32") else "     FAIL" + " " * 10)
        i8s = (f"{row['int8'] * 1e3:9.2f} {row['int8'] / b * 1e6:10.1f}"
               if row.get("int8") else "     FAIL")
        print(f"  {b:5d} {f32s} {i8s}")
        for k in ("f32_err", "int8_err"):
            if k in row:
                print(f"        {k}: {row[k]}")
        sys.stdout.flush()

    # ---- 2. end-to-end: baseline B=250 vs improved Bs -----------------
    base_b = SWEEP[0]
    ok = {b: r for b, r in results.items() if r.get("f32")}
    candidates = [b for b in ok if b != base_b
                  and ok[b]["f32"] / b < ok[base_b]["f32"] / base_b]
    print(f"\nend-to-end candidates beyond B={base_b}: "
          f"{candidates or 'none (per-dispatch curve is flat/worse)'}")

    def make_pipeline(batch, ap):
        n_full = (n_frames // batch) * batch
        centers_mat = jnp.asarray(
            (HALF + np.arange(n_full)).reshape(n_full // batch, batch))
        tail_chunks = []
        start = n_full
        while start < n_frames:
            n = min(GROUP, n_frames - start)
            tail_chunks.append(jnp.asarray(HALF + start + np.arange(n)))
            start += n

        @jax.jit
        def full(variables, audio):
            xp = features(audio)

            def body(acc, centers):
                y = ap(variables, gather_windows(xp, centers, 75))
                return acc + jnp.sum(y.astype(jnp.float32)), None

            total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                    centers_mat)
            for c in tail_chunks:
                y = ap(variables, gather_windows(xp, c, 75))
                total = total + jnp.sum(y.astype(jnp.float32))
            return total

        n_tail = n_frames - n_full
        return full, n_full // batch, n_tail

    e2e = [base_b] + candidates
    checks = {}
    for b in e2e:
        for name, ap in (("f32", apply_f32), ("int8", apply_int8)):
            pipe, rows, n_tail = make_pipeline(b, ap)
            try:
                chk = float(pipe(variables, audio_dev))
                dt = timed(pipe, variables, audio_dev)
            except Exception as e:
                print(f"  B={b} {name}: FAIL "
                      f"{type(e).__name__}: {e}"[:160])
                continue
            checks.setdefault(name, []).append(chk)
            print(f"  B={b:4d} {name:4s}: scan {rows} rows + "
                  f"{n_tail}-frame tail = {dt:.3f} s  "
                  f"rt={AUDIO_SECONDS / dt:.1f}x")
            sys.stdout.flush()
    # all batchings compute the same windows → checksums must agree
    for name, cs in checks.items():
        ref = cs[0]
        assert all(abs(c - ref) <= 1e-4 * max(1.0, abs(ref))
                   for c in cs), (name, cs)
    if checks:
        print("\nchecksums agree across batchings (composition-exact)")


if __name__ == "__main__":
    main()
