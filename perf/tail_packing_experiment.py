#!/usr/bin/env python
"""Tail-group packing: the last unmeasured protocol-exact micro-route
(VERDICT r3 task 2).

The bench's windowed protocol runs 10 scanned 250-window dispatches plus
two tail dispatches (one full 50-group, one natural-size 34 remainder)
for 60 s of audio. Under ``cross_batch:50`` grouped attention the full
50-group could instead ride an 11th full 250-window scan row padded with
four dummy WHOLE groups — block-diagonal attention means dummy groups
cannot touch real outputs (ops/attention.py:96-114), so this is
composition-exact; only the natural-size remainder must keep its own
dispatch. Packing trades the standalone 50-window dispatch for one extra
full scan iteration: it wins iff t(50-window dispatch) > t(250-window
scan row), i.e. iff small-batch MXU efficiency is catastrophically bad.

This script measures, on the real chip:
  1. the per-window dispatch-time curve over batch {34, 50, 100, 150,
     200, 250} (quantifies small-batch efficiency directly);
  2. end-to-end windowed RT for mode A (current: scan + 50 + 34) vs
     mode B (packed: scan incl. dummy-padded row + 34), identical audio
     span, identical real outputs in the checksum (dummy outputs are
     masked out).

Model/geometry = bench.py exactly (exp180e SAUnet:XL, 60 s, BATCH 250,
GROUP 50). Honest host-fetch sync (CLAUDE.md). Reference for the
protocol being matched: exp180d…py:427-443.

Result (v5e, 2026-08-19, this round): see perf/results_r4_tail_packing.txt.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

AUDIO_SECONDS = 60.0
FS = 22050
BATCH = 250
GROUP = 50
HALF = 37


def main():
    global AUDIO_SECONDS, BATCH, GROUP
    smoke = "--smoke" in sys.argv        # CPU logic check: tiny model
    import jax

    if smoke:
        jax.config.update("jax_platforms", "cpu")
        AUDIO_SECONDS, BATCH, GROUP = 3.0, 20, 10
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/multipitch_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses

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
    tail = n_frames - n_full                       # 84 for 60 s
    tail_groups = tail // GROUP                    # 1 full 50-group
    rem = tail - tail_groups * GROUP               # 34 remainder
    print(f"n_frames={n_frames} scan_rows={n_full // BATCH} "
          f"tail={tail} (full_groups={tail_groups}, remainder={rem})")

    apply_b = lambda v, xw: model_grouped.apply(v, xw, train=False)

    def timed(fn, *args, reps=5):
        float(fn(*args))                           # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))                       # host fetch = sync
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # ---- 1. per-window dispatch-time curve --------------------------
    xp_host = features(audio_dev)
    print("\nper-dispatch time vs batch size (model forward only):")
    curve = (rem, GROUP, BATCH) if smoke else (rem, GROUP, 100, 150, 200,
                                               BATCH)
    for b in [b for b in curve if b > 0]:
        centers = jnp.asarray(HALF + np.arange(b))

        @jax.jit
        def one(variables, xp, centers=centers):
            y = apply_b(variables, gather_windows(xp, centers, 75))
            return jnp.sum(y.astype(jnp.float32))

        dt = timed(one, variables, xp_host)
        print(f"  B={b:4d}: {dt * 1e3:8.2f} ms  "
              f"{dt / b * 1e6:7.1f} us/window")
        sys.stdout.flush()

    # ---- 2. end-to-end A vs B ----------------------------------------
    centers_a = jnp.asarray(
        (HALF + np.arange(n_full)).reshape(n_full // BATCH, BATCH))
    mask_a = jnp.ones((n_full // BATCH, BATCH), jnp.float32)
    tail_chunks = []
    start = n_full
    while start < n_frames:
        n = min(GROUP, n_frames - start)
        tail_chunks.append(jnp.asarray(HALF + start + np.arange(n)))
        start += n

    # packed: append one scan row per ceil(tail_groups*GROUP/BATCH) with
    # the tail's full groups + dummy whole groups (centers clamped to the
    # first tail center; outputs masked out of the checksum)
    packed_real = HALF + n_full + np.arange(tail_groups * GROUP)
    pad = (-len(packed_real)) % BATCH
    packed_row = np.concatenate(
        [packed_real, np.full(pad, packed_real[0] if len(packed_real)
                              else HALF)])
    packed_mask = np.concatenate(
        [np.ones(len(packed_real), np.float32), np.zeros(pad, np.float32)])
    centers_b = jnp.concatenate(
        [centers_a, jnp.asarray(packed_row.reshape(-1, BATCH))])
    mask_b = jnp.concatenate(
        [mask_a, jnp.asarray(packed_mask.reshape(-1, BATCH))])

    def make_pipeline(centers_mat, mask_mat, tails):
        @jax.jit
        def full(variables, audio):
            xp = features(audio)

            def body(acc, cm):
                centers, mask = cm
                y = apply_b(variables, gather_windows(xp, centers, 75))
                y = y.reshape(y.shape[0], -1)
                return acc + jnp.sum(y.astype(jnp.float32)
                                     * mask[:, None]), None

            total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                    (centers_mat, mask_mat))
            for c in tails:
                y = apply_b(variables, gather_windows(xp, c, 75))
                total = total + jnp.sum(y.astype(jnp.float32))
            return total

        return full

    mode_a = make_pipeline(centers_a, mask_a, tail_chunks)
    mode_b = make_pipeline(centers_b, mask_b,
                           tail_chunks[tail_groups:])   # remainder only

    # composition-exactness check: both modes sum the SAME real windows
    # (dummy-group outputs masked out), so the checksums must agree
    sum_a, sum_b = float(mode_a(variables, audio_dev)), \
        float(mode_b(variables, audio_dev))
    assert abs(sum_a - sum_b) <= 1e-4 * max(1.0, abs(sum_a)), (sum_a, sum_b)
    print(f"\nchecksums agree: A={sum_a:.6g} B={sum_b:.6g}")

    dt_a = timed(mode_a, variables, audio_dev, reps=3)
    print(f"\nmode A (scan {n_full // BATCH} rows + {tail_groups}x"
          f"{GROUP} + {rem}): {dt_a:.3f} s  rt={AUDIO_SECONDS / dt_a:.1f}x")
    dt_b = timed(mode_b, variables, audio_dev, reps=3)
    print(f"mode B (scan {int(centers_b.shape[0])} rows [{pad} dummy "
          f"windows] + {rem}): {dt_b:.3f} s  "
          f"rt={AUDIO_SECONDS / dt_b:.1f}x")
    print(f"\npacking {'WINS' if dt_b < dt_a else 'LOSES'}: "
          f"{(dt_a - dt_b) / dt_a * 100:+.2f}% of mode-A time")


if __name__ == "__main__":
    main()
