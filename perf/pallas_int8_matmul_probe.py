"""Does the v5e expose an int8 MXU rate XLA doesn't use?

Round-2 measured jnp.dot int8 at 166 T/s vs bf16 161 T/s — no doubling —
and concluded a Pallas int8 conv "could not unlock 2x either" WITHOUT
measuring it. This probe measures it: a tiled Pallas int8 matmul
(int8 x int8 -> int32 via jax.lax.dot_general with
preferred_element_type=int32, accumulation in VMEM scratch) vs jnp.dot
in int8/bf16/f32 at the same shape. If Pallas int8 lands near 2x bf16
(v5e nominal: 394 int8 TOPS vs 197 bf16 TFLOP/s), an int8 conv kernel
for the U-Net's FLOP-dominant convs is the path past the 50x target;
if it matches jnp.dot, the hardware bound argument stands MEASURED.

Run on the real TPU (one chip, no concurrent jobs).
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/multipitch_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = N = K = 4096
TM = TN = 512
TK = 4096          # full K per tile: one dot per grid cell, no K loop


def mm_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


@jax.jit
def pallas_int8_mm(a, b):
    return pl.pallas_call(
        mm_kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        grid=(M // TM, N // TN),
        in_specs=[
            pl.BlockSpec((TM, TK), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, TN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(a, b)


N_ITER = 50


def timed_tops(mm, a, b, feedback, reps=3):
    """N_ITER matmuls inside ONE jitted scan (per-dispatch latency
    through the relayed TPU backend is ~30 ms — a single 4096^3 matmul
    is 0.4 ms, so per-call timing measures the tunnel, not the MXU).

    Each iteration's input is ``feedback`` of the previous full product:
    a cheap VPU transform that (a) defeats CSE of identical dots and
    (b) CONSUMES every output element — consuming only y[0,0] lets
    XLA's slice-of-dot simplification compute a single row and report
    >nominal-peak fantasy rates (measured 249 "TFLOP/s" on a 197-peak
    chip before this fix)."""

    @jax.jit
    def loop(a, b):
        def body(a, _):
            y = mm(a, b)
            return feedback(y), None

        a_fin, _ = jax.lax.scan(body, a, None, length=N_ITER)
        return jnp.sum(a_fin.astype(jnp.float32)[::512, ::512])

    float(loop(a, b))                                   # compile + warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(a, b))                               # host fetch sync
        best = min(best, time.perf_counter() - t0)
    return 2 * M * N * K * N_ITER / best / 1e12


def main():
    rng = np.random.RandomState(0)
    a8 = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
    b8 = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
    af = jnp.asarray(rng.rand(M, K), jnp.float32)
    bf = jnp.asarray(rng.rand(K, N), jnp.float32)

    fb8 = lambda y: (y & 127).astype(jnp.int8)          # consumes all of y
    fbf = lambda y: y.astype(jnp.float32) * 1e-6

    dot32 = functools.partial(jnp.dot, preferred_element_type=jnp.int32)
    print(f"jnp.dot  int8->int32 : {timed_tops(dot32, a8, b8, fb8):7.1f}"
          f" TOP/s")
    dotbf = lambda x, y: jnp.dot(x.astype(jnp.bfloat16),
                                 y.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
    print(f"jnp.dot  bf16->f32   : {timed_tops(dotbf, af, bf, fbf):7.1f}"
          f" TFLOP/s")
    print(f"pallas   int8->int32 : "
          f"{timed_tops(pallas_int8_mm, a8, b8, fb8):7.1f} TOP/s")


if __name__ == "__main__" and "--variant" not in sys.argv:
    main()


# variant: K-blocked accumulating kernel with explicit dimension
# semantics — rules out the naive single-dot kernel as the limiter
TK2 = 1024


def mm_kernel_acc(a_ref, b_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


@jax.jit
def pallas_int8_mm_acc(a, b):
    return pl.pallas_call(
        mm_kernel_acc,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        grid=(M // TM, N // TN, K // TK2),
        in_specs=[
            pl.BlockSpec((TM, TK2), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK2, TN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(a, b)


def variant():
    rng = np.random.RandomState(0)
    a8 = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
    b8 = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
    fb8 = lambda y: (y & 127).astype(jnp.int8)
    print(f"pallas   int8 K-acc  : "
          f"{timed_tops(pallas_int8_mm_acc, a8, b8, fb8):7.1f} TOP/s")


if __name__ == "__main__" and "--variant" in sys.argv:
    variant()
