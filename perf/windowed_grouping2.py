"""Optimize the protocol-exact grouped-50 windowed path: gather once per
scan step (G*50 windows), reshape to (G, 50, ...), vmap only the model."""
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

T = 2500
CTX = 75
x = jnp.asarray(np.random.RandomState(0).rand(6, T + CTX, 216), jnp.float32)
variables = model.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 6, 75, 216)), train=False)
half = CTX // 2
fps = 43.066406250

def timeit(fn, *args, reps=2):
    float(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best

def make(G, B):
    nb = T // (G * B)
    cm = jnp.asarray(half + np.arange(nb * G * B).reshape(nb, G * B))
    @jax.jit
    def fn(variables, xp, cm):
        def body(acc, centers):
            xw = gather_windows(xp, centers, CTX)          # (G*B, 6, 75, 216)
            xg = xw.reshape(G, B, *xw.shape[1:])
            y = jax.vmap(lambda xi: model.apply(variables, xi, train=False))(xg)
            return acc + jnp.sum(y.astype(jnp.float32)), None
        return jax.lax.scan(body, jnp.zeros((), jnp.float32), cm)[0]
    return fn, cm, nb * G * B

for G, B in ((5, 50), (10, 50)):
    fn, cm, nw = make(G, B)
    t_ = timeit(fn, variables, x, cm)
    print(f"grouped G={G:2d}x{B}  {t_*1e3:8.1f} ms  {t_/nw*1e3:6.3f} ms/win  rt={nw/fps/t_:6.1f}x")
