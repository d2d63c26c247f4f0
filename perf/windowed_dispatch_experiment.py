"""Measure dispatch/fetch overhead of the windowed protocol path:
(a) current predict_framewise: per-batch jit call + synchronous host
    fetch through the axon tunnel;
(b) same math as ONE on-device lax.scan over the window batches, one
    host fetch at the end. Batch composition (groups of 50) is unchanged,
    so outputs are protocol-exact (cross-batch attention intact).
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/multipitch_tpu_jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multipitch_architectures_tpu.models import SimpleUNetDoubleSelfAttn
from multipitch_architectures_tpu.data.windows import gather_windows

# SAUnet:XL (exp180e)
model = SimpleUNetDoubleSelfAttn(
    n_chan_layers=(128, 200, 150, 150), n_bins_out=72, scalefac=2,
    embed_dim=256, num_heads=8, mlp_dim=8192, pos_encoding="sinusoidal")

T = 1000            # frames (~23 s audio); 20 batches of 50
CTX, B = 75, 50
x = jnp.asarray(np.random.RandomState(0).rand(6, T + CTX, 216), jnp.float32)
variables = model.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 6, 75, 216)), train=False)

def apply_fn(v, xw):
    return model.apply(v, xw, train=False)

@partial(jax.jit, static_argnames=())
def one_batch(variables, xp, centers):
    xw = gather_windows(xp, centers, CTX)
    y = apply_fn(variables, xw)
    return y.reshape(y.shape[0], -1)

@jax.jit
def scanned(variables, xp, all_centers):   # all_centers: (n_batches, B)
    def body(_, centers):
        xw = gather_windows(xp, centers, CTX)
        y = apply_fn(variables, xw)
        return None, y.reshape(y.shape[0], -1)
    _, ys = jax.lax.scan(body, None, all_centers)
    return ys.reshape(-1, ys.shape[-1])

half = CTX // 2
nb = T // B
centers = half + np.arange(T).reshape(nb, B)

# --- (a) per-batch dispatch + sync fetch (current behavior)
outs = [np.asarray(one_batch(variables, x, jnp.asarray(c))) for c in centers]  # warm
t0 = time.perf_counter()
outs = [np.asarray(one_batch(variables, x, jnp.asarray(c))) for c in centers]
ta = time.perf_counter() - t0
ya = np.concatenate(outs)

# --- (a2) per-batch dispatch, fetch at end (async pipeline)
ys = [one_batch(variables, x, jnp.asarray(c)) for c in centers]
_ = [np.asarray(y) for y in ys]  # warm done above anyway
t0 = time.perf_counter()
ys = [one_batch(variables, x, jnp.asarray(c)) for c in centers]
ya2 = np.concatenate([np.asarray(y) for y in ys])
ta2 = time.perf_counter() - t0

# --- (b) one scan dispatch
yb = np.asarray(scanned(variables, x, jnp.asarray(centers)))  # warm/compile
t0 = time.perf_counter()
yb = np.asarray(scanned(variables, x, jnp.asarray(centers)))
tb = time.perf_counter() - t0

print(f"per-batch sync fetch : {ta*1e3:8.1f} ms  ({ta/nb*1e3:.1f} ms/batch)")
print(f"per-batch async fetch: {ta2*1e3:8.1f} ms  ({ta2/nb*1e3:.1f} ms/batch)")
print(f"single scan dispatch : {tb*1e3:8.1f} ms  ({tb/nb*1e3:.1f} ms/batch)")
print(f"max |scan - perbatch|: {np.abs(yb - ya).max():.2e}")
print(f"audio rt factor scan : {T/43.066/tb:.1f}x   perbatch: {T/43.066/ta:.1f}x")
