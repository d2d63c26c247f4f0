#!/usr/bin/env python
"""Benchmark: real-time factor of HCQT + SAUnet:XL inference on one chip.

Measures the full audio→prediction pipeline (matches the BASELINE.json
north star "≥50x real-time HCQT+SAUnet:XL inference per v5e chip"):

  1. synthesize AUDIO_SECONDS of 22.05 kHz audio;
  2. efficient 6-channel HCQT on device (multirate matmul CQT);
  3. SAUnet:XL (exp180e config, random weights — timing only) over every
     frame, in the framework's serving mode: ONE dense pass over the
     whole padded recording (the TPU-native redesign of the reference's
     75x-redundant stride-1 window loop). The protocol-exact windowed
     mode is timed too and reported alongside.

Timing is honest for relayed backends: each pipeline is ONE jitted
executable ending in a checksum whose value is fetched to the host
(block_until_ready can return at enqueue through the TPU tunnel).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])

AUDIO_SECONDS = 60.0
FS = 22050
BATCH = 250          # 5 reference test batches (50) fused per dispatch
GROUP = 50           # the reference test DataLoader batch size
TARGET_RT = 50.0
HALF = 37


def main():
    import jax

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

    cfg = load_experiment(
        "exp180e_musicnet_unet_insanelylarge_doubleselfattn")
    model = cfg.build_model()
    # protocol-exact windowed variant: convs fused over BATCH windows per
    # dispatch while attention stays block-diagonal in groups of 50 — the
    # reference test loader's exact batch composition (exp180e…py:62-65)
    import dataclasses

    model_grouped = dataclasses.replace(model, attn_mode="cross_batch:50")
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

    @jax.jit
    def windowed_pipeline(variables, audio, centers_mat):
        xp = features(audio)

        def body(acc, centers):
            xw = gather_windows(xp, centers, 75)
            y = model_grouped.apply(variables, xw, train=False)
            return acc + jnp.sum(y.astype(jnp.float32)), None

        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                centers_mat)
        return total, xp

    @jax.jit
    def windowed_tail(variables, xp, centers):
        xw = gather_windows(xp, centers, 75)
        y = model_grouped.apply(variables, xw, train=False)
        return jnp.sum(y.astype(jnp.float32))

    def windowed_full(variables, audio):
        total, xp = windowed_pipeline(variables, audio, centers_mat)
        for c in tail_chunks:
            total = total + windowed_tail(variables, xp, c)
        return total

    def timed_rt(fn, *args, reps=3):
        float(fn(*args))                       # warm-up / compile
        best = min(_timed(fn, *args) for _ in range(reps))
        return AUDIO_SECONDS / best

    def _timed(fn, *args):
        t0 = time.perf_counter()
        float(fn(*args))                       # host fetch = honest sync
        return time.perf_counter() - t0

    import os

    bench_start = time.perf_counter()
    dense_rt = timed_rt(dense_pipeline, variables, audio_dev)

    # the secondary (protocol-exact stride-1) measurement compiles a
    # second large executable; skip it when close to the time budget so
    # the primary line always prints (cached runs easily fit)
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    windowed_rt = None
    if time.perf_counter() - bench_start < budget_s * 0.5:
        try:
            windowed_rt = timed_rt(windowed_full, variables, audio_dev)
        except Exception:
            windowed_rt = None

    out = {
        "metric": "hcqt_saunet_xl_dense_inference_realtime_factor",
        "value": round(dense_rt, 1),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(dense_rt / TARGET_RT, 3),
    }
    if windowed_rt is not None:
        out["windowed_protocol_rt"] = round(windowed_rt, 1)
        out["windowed_vs_50x_target"] = round(windowed_rt / TARGET_RT, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
