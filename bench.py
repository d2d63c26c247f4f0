#!/usr/bin/env python
"""Benchmark: real-time factor of HCQT + SAUnet:XL framewise inference on
one chip.

Protocol (matches the BASELINE.json north star "≥50x real-time
HCQT+SAUnet:XL inference per v5e chip"):
  1. synthesize AUDIO_SECONDS of 22.05 kHz audio;
  2. compute the 6-channel efficient HCQT on device (multirate matmul CQT);
  3. run SAUnet:XL (exp180e config, random weights — timing only) over
     every frame (stride-1 windowed protocol, batched);
  4. report audio-seconds processed per wall-clock second.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the real-time factor divided by the 50x target.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])

AUDIO_SECONDS = 60.0
FS = 22050
BATCH = 256
TARGET_RT = 50.0


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

    # -- audio -------------------------------------------------------------
    t = np.arange(int(AUDIO_SECONDS * FS)) / FS
    audio = sum((1.0 / h) * np.sin(2 * np.pi * 261.63 * h * t)
                for h in (1, 2, 3, 4, 5)).astype(np.float32)

    # -- model -------------------------------------------------------------
    cfg = load_experiment(
        "exp180e_musicnet_unet_insanelylarge_doubleselfattn")
    model = cfg.build_model()
    xw = jnp.zeros((BATCH, 6, 75, 216), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, xw,
                           train=False)

    @jax.jit
    def forward_windows(variables, inputs_padded, centers):
        x = gather_windows(inputs_padded, centers, 75)
        y = model.apply(variables, x, train=False)
        return y.reshape(y.shape[0], -1)

    audio_dev = jnp.asarray(audio)

    def run_once():
        f, _, hop = efficient_hcqt_device(
            audio_dev, fs=FS, fs_hcqt_target=50, bins_per_octave=36,
            num_octaves=6, tuning=0.0)
        x = jnp.log1p(10.0 * f)
        n_frames = x.shape[1]
        half = 75 // 2
        xp = jnp.pad(x, ((0, 0), (half, half + 1), (0, 0)))
        preds = []
        for start in range(0, n_frames, BATCH):
            centers = half + start + np.arange(BATCH)
            centers = np.minimum(centers, half + n_frames - 1)
            preds.append(forward_windows(variables, xp,
                                         jnp.asarray(centers)))
        return jax.block_until_ready(jnp.concatenate(preds)[:n_frames])

    run_once()                      # warm-up / compile
    t0 = time.perf_counter()
    pred = run_once()
    elapsed = time.perf_counter() - t0

    rt_factor = AUDIO_SECONDS / elapsed
    print(json.dumps({
        "metric": "hcqt_saunet_xl_inference_realtime_factor",
        "value": round(rt_factor, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(rt_factor / TARGET_RT, 3),
    }))


if __name__ == "__main__":
    main()
