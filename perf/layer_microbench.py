"""Per-layer achieved-TFLOP/s microbenchmark of the SAUnet:XL windowed
path on the real TPU: times each conv shape (batch 50 windows) standalone
to find which layers run far below MXU peak.

The conv is kept inside the timing loop by threading a data dependence
through the carry (otherwise XLA hoists the loop-invariant conv and the
numbers exceed hardware peak). Honest sync: host scalar fetch.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/multipitch_tpu_jax_cache")
import jax, jax.numpy as jnp

B = 50
CASES = [
    ("inc.1",     6,   32, 15, 75, 216),
    ("inc.2",    32,   32, 15, 75, 216),
    ("down1.1",  32,   64, 15, 37, 108),
    ("down1.2",  64,   64, 15, 37, 108),
    ("down2.1",  64,  128,  9, 18, 54),
    ("down2.2", 128,  128,  9, 18, 54),
    ("down3.1", 128,  256,  5,  9, 27),
    ("upconv2.1",256, 128,  5, 18, 54),
    ("upconv3.1",128,  64,  9, 37, 108),
    ("upconv3.2", 64,  32,  9, 37, 108),
    ("upconv4.1", 64,  32, 15, 75, 216),
    ("upconv4.2", 32, 128, 15, 75, 216),
    ("conv2",   128,  200,  3, 75, 216),  # stride (1,3)
]

def bench(name, cin, cout, k, t, f, iters=20):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, t, f, cin), jnp.float32)
    w = jax.random.normal(key, (k, k, cin, cout), jnp.float32) * 0.01
    stride = (1, 3) if name == "conv2" else (1, 1)
    pad = ((1, 1), (0, 0)) if name == "conv2" else "SAME"

    @jax.jit
    def run(x, w):
        def body(i, carry):
            xi, acc = carry
            y = jax.lax.conv_general_dilated(
                xi, w, stride, pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            m = y.mean()
            # force the conv to stay in the loop: xi depends on y
            return (xi * (1.0 + 0.0 * m), acc + m)
        return jax.lax.fori_loop(0, iters, body, (x, 0.0))[1]

    float(run(x, w))  # compile+warm
    t0 = time.perf_counter()
    float(run(x, w))
    dt = (time.perf_counter() - t0) / iters
    fout = (f - 3) // 3 + 1 if name == "conv2" else f
    fl = 2 * cin * cout * k * k * t * fout * B
    print(f"{name:12s} {fl/1e9:7.2f} GF  {dt*1e3:7.2f} ms  "
          f"{fl/dt/1e12:6.1f} TFLOP/s", flush=True)
    return fl, dt

tot_f = tot_t = 0.0
for c in CASES:
    fl, dt = bench(*c)
    tot_f += fl; tot_t += dt
print(f"{'SUM':12s} {tot_f/1e9:7.2f} GF  {tot_t*1e3:7.2f} ms  {tot_f/tot_t/1e12:6.1f} TFLOP/s")
