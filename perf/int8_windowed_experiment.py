"""Does int8 lift the windowed protocol past 50x? Times the exact
bench.py windowed pipeline (HCQT + SAUnet:XL, 250-window dispatches,
grouped cross_batch:50 attention) with the f32 apply vs the dynamic-int8
conv apply (eval/quant.py). Honest sync: host scalar fetch."""
import dataclasses
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/multipitch_tpu_jax_cache")
import numpy as np
import jax
import jax.numpy as jnp
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multipitch_architectures_tpu.data.windows import gather_windows
from multipitch_architectures_tpu.dsp.hcqt import efficient_hcqt_device
from multipitch_architectures_tpu.eval import quantized_apply_fn
from multipitch_architectures_tpu.experiments import load_experiment

AUDIO_SECONDS = 60.0
FS = 22050
BATCH = 250
HALF = 37

t = np.arange(int(AUDIO_SECONDS * FS)) / FS
audio = sum((1.0 / h) * np.sin(2 * np.pi * 261.63 * h * t)
            for h in (1, 2, 3, 4, 5)).astype(np.float32)
audio_dev = jnp.asarray(audio)

cfg = load_experiment("exp180e_musicnet_unet_insanelylarge_doubleselfattn")
model = dataclasses.replace(cfg.build_model(), attn_mode="cross_batch:50")
variables = model.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 6, 75, 216), jnp.float32), train=False)

f32_apply = lambda v, xw: model.apply(v, xw, train=False)
int8_apply = quantized_apply_fn(model)


def features(audio):
    f, _, _ = efficient_hcqt_device(audio, fs=FS, fs_hcqt_target=50,
                                    bins_per_octave=36, num_octaves=6,
                                    tuning=0.0)
    x = jnp.log1p(10.0 * f)
    return jnp.pad(x, ((0, 0), (HALF, HALF + 1), (0, 0)))


n_frames = int(len(audio) // 512) + 1
n_full = (n_frames // BATCH) * BATCH
centers_mat = jnp.asarray((HALF + np.arange(n_full)).reshape(-1, BATCH))


def make_pipeline(apply_fn):
    @jax.jit
    def pipeline(variables, audio, centers_mat):
        xp = features(audio)

        def body(acc, centers):
            xw = gather_windows(xp, centers, 75)
            y = apply_fn(variables, xw)
            return acc + jnp.sum(y.astype(jnp.float32)), None

        return jax.lax.scan(body, jnp.zeros((), jnp.float32), centers_mat)[0]
    return pipeline


from multipitch_architectures_tpu.eval import calibrate_activation_scales

# calibrate the static-scale mode on a few protocol batches of this
# recording (eager f32 forwards)
_xp_cal = features(audio_dev)
_cal = [gather_windows(_xp_cal, HALF + 50 * b + np.arange(50), 75)
        for b in range(4)]
scales = calibrate_activation_scales(model, variables, _cal)
int8_static_apply = quantized_apply_fn(model, activation_scales=scales)

for name, apply_fn in (("f32", f32_apply), ("int8", int8_apply),
                       ("int8-static", int8_static_apply)):
    fn = make_pipeline(apply_fn)
    float(fn(variables, audio_dev, centers_mat))           # compile+warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(variables, audio_dev, centers_mat))
        best = min(best, time.perf_counter() - t0)
    rt = n_full / 43.066406250 / best
    print(f"{name:5s} {best:7.3f} s  {best / n_full * 1e3:6.3f} ms/win"
          f"  rt={rt:6.1f}x")
