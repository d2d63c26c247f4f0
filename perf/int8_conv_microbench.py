"""Is int8 worth it? v5e's int8 MXU peak is 2x bf16, so if XLA lowers
int8 convs at rate, a quantized serving mode could lift the windowed
protocol past the 50x target. This times the FLOP-dominant SAUnet:XL
conv shapes in f32 (which already runs one-pass bf16 MXU) vs int8
(int8 operands, int32 accumulation). Honest sync: host scalar fetch.
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/multipitch_tpu_jax_cache")
import jax
import jax.numpy as jnp

B = 50
CASES = [
    ("inc.2",      32,  32, 15, 75, 216),
    ("upconv4.1",  64,  32, 15, 75, 216),
    ("upconv4.2",  32, 128, 15, 75, 216),
    ("upconv3.1", 128,  64,  9, 37, 108),
]


def bench(name, cin, cout, k, t, f, dtype, iters=20):
    key = jax.random.PRNGKey(0)
    if dtype == jnp.int8:
        x = jax.random.randint(key, (B, t, f, cin), -127, 127, jnp.int8)
        w = jax.random.randint(key, (k, k, cin, cout), -127, 127, jnp.int8)
        acc = jnp.int32
    else:
        x = jax.random.normal(key, (B, t, f, cin), dtype)
        w = jax.random.normal(key, (k, k, cin, cout), dtype) * 0.01
        acc = jnp.float32

    @jax.jit
    def run(x, w):
        def body(i, carry):
            xi, s = carry
            y = jax.lax.conv_general_dilated(
                xi, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc)
            m = y.sum()
            # data dependence XLA cannot fold away: a select on a
            # runtime predicate (int8's `x ^ (m & 0)` constant-folds and
            # the conv hoists out of the loop, inflating rates past peak)
            xi = jax.lax.cond(m == jnp.asarray(12345, acc),
                              lambda v: v + jnp.ones((), dtype),
                              lambda v: v, xi)
            return (xi, s + m.astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))[1]

    float(run(x, w))
    t0 = time.perf_counter()
    float(run(x, w))
    dt = (time.perf_counter() - t0) / iters
    flops = 2.0 * B * t * f * cin * cout * k * k
    print(f"{name:10s} {str(dtype.__name__ if hasattr(dtype,'__name__') else dtype):8s}"
          f" {dt*1e3:8.3f} ms  {flops/dt/1e12:7.1f} T(op)/s")
    return dt


for case in CASES:
    t_f32 = bench(*case, jnp.float32)
    t_i8 = bench(*case, jnp.int8)
    print(f"{case[0]:10s} int8 speedup: {t_f32 / t_i8:.2f}x")
