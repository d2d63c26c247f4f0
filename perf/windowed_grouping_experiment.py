"""Windowed-protocol throughput: batch composition and dtype variants.

(A) scan, flat batch 256       — what BENCH_r01 measured; NOT protocol-
                                 exact for cross-batch-attention models
                                 (reference groups windows in 50s).
(B) scan, vmap over 5 groups of 50 — protocol-exact batch composition at
                                 effective batch 250.
(C)/(D): same with bf16 params+activations (f32 accumulation).
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/multipitch_tpu_jax_cache")
import numpy as np
import jax, jax.numpy as jnp
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multipitch_architectures_tpu.models import SimpleUNetDoubleSelfAttn
from multipitch_architectures_tpu.data.windows import gather_windows

model = SimpleUNetDoubleSelfAttn(
    n_chan_layers=(128, 200, 150, 150), n_bins_out=72, scalefac=2,
    embed_dim=256, num_heads=8, mlp_dim=8192, pos_encoding="sinusoidal")

T = 2500            # ~58 s of audio at 43.07 fps
CTX = 75
x = jnp.asarray(np.random.RandomState(0).rand(6, T + CTX, 216), jnp.float32)
variables = model.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 6, 75, 216)), train=False)
half = CTX // 2

def timeit(fn, *args, reps=2):
    float(fn(*args))
    return min((lambda t0: (float(fn(*args)), time.perf_counter() - t0)[1])(
        time.perf_counter()) for _ in range(reps))

# (A) flat 256
BA = 256
nbA = T // BA  # truncate for timing comparability
centersA = jnp.asarray(half + np.arange(nbA * BA).reshape(nbA, BA))

@jax.jit
def flat256(variables, xp, cm):
    def body(acc, centers):
        xw = gather_windows(xp, centers, CTX)
        y = model.apply(variables, xw, train=False)
        return acc + jnp.sum(y.astype(jnp.float32)), None
    return jax.lax.scan(body, jnp.zeros((), jnp.float32), cm)[0]

# (B) vmap groups of 50, 5 per scan step (eff 250)
G, BB = 5, 50
nbB = T // (G * BB)
centersB = jnp.asarray(half + np.arange(nbB * G * BB).reshape(nbB, G, BB))

@jax.jit
def grouped50(variables, xp, cm):
    def fwd_group(centers):
        xw = gather_windows(xp, centers, CTX)
        return model.apply(variables, xw, train=False)
    def body(acc, centers_g):
        y = jax.vmap(fwd_group)(centers_g)
        return acc + jnp.sum(y.astype(jnp.float32)), None
    return jax.lax.scan(body, jnp.zeros((), jnp.float32), cm)[0]

def to_bf16(tree):
    return jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                        if a.dtype == jnp.float32 else a, tree)

vb = to_bf16(variables)
xb = x.astype(jnp.bfloat16)

tA = timeit(flat256, variables, x, centersA)
tB = timeit(grouped50, variables, x, centersB)
tC = timeit(flat256, vb, xb, centersA)
tD = timeit(grouped50, vb, xb, centersB)
fps = 43.066406250
for name, t_, nw in (("A flat256 f32", tA, nbA*BA), ("B grouped50 f32", tB, nbB*G*BB),
                     ("C flat256 bf16", tC, nbA*BA), ("D grouped50 bf16", tD, nbB*G*BB)):
    print(f"{name:18s} {t_*1e3:8.1f} ms  {t_/nw*1e3:6.3f} ms/win  rt={nw/fps/t_:6.1f}x")
