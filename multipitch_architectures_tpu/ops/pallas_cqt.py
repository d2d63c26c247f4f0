"""Pallas TPU kernel for the CQT octave step.

Computes, for one octave, the magnitude response of the constant-Q
filterbank at every hop: ``mag[t, k] = |Σ_m y[t·hop + m]·K[m, k]|`` —
fusing the strided frame gather, the (n_fft × 2·bpo) MXU matmul and the
complex magnitude in one kernel, so frames are never materialized in HBM
(the XLA fallback materializes a (2bpo, T) pair and runs a separate
sqrt pass).

Grid: one program per tile of TILE_T frames. Audio stays in HBM; each
program DMAs the slab its tile needs ((TILE_T-1)·hop + n_fft samples —
tiles overlap by n_fft-hop, which BlockSpec pipelining can't express) into
VMEM, builds the frame matrix from static slices (hop/n_fft are
compile-time constants) and feeds the MXU via ``jnp.dot`` with
``preferred_element_type=float32``.

Used by ``dsp.cqt`` when ``use_pallas=True``; numerics match the XLA path
to float tolerance (tests run the interpreter on CPU).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _align_up(x, m):
    return -(-x // m) * m


def _octave_kernel(y_hbm, kr_ref, out_ref, *, tile_t, hop, n_fft, bpo):
    i = pl.program_id(0)
    # Mosaic requires 1-D HBM slice lengths (and starts) aligned to the
    # 1024-element tiling; tile_t is chosen so tile_t*hop % 1024 == 0
    slab_len = _align_up((tile_t - 1) * hop + n_fft, 1024)

    def body(slab_vmem, frames_vmem, sem):
        dma = pltpu.make_async_copy(
            y_hbm.at[pl.ds(i * tile_t * hop, slab_len)], slab_vmem, sem)
        dma.start()
        dma.wait()
        # build the (tile_t, n_fft) frame matrix row by row with static
        # slices into a VMEM scratch (Mosaic lowers neither dynamic_slice
        # nor a big stack-of-slices concat)
        for t in range(tile_t):
            frames_vmem[t, :] = slab_vmem[t * hop: t * hop + n_fft]
        ri = jnp.dot(frames_vmem[:], kr_ref[:],
                     preferred_element_type=jnp.float32)
        re, im = ri[:, :bpo], ri[:, bpo:]
        out_ref[:] = jnp.sqrt(re * re + im * im + 1e-30)

    pl.run_scoped(
        body,
        pltpu.VMEM((slab_len,), jnp.float32),
        pltpu.VMEM((tile_t, n_fft), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    )


def _choose_tile_t(tile_t, hop):
    """Smallest tile ≥ tile_t with tile_t*hop a multiple of 1024 (hop is a
    power of two), so every DMA start offset is tiling-aligned."""
    while (tile_t * hop) % 1024 != 0:
        tile_t *= 2
    return tile_t


@partial(jax.jit,
         static_argnames=("hop", "n_fft", "bpo", "n_frames", "tile_t",
                          "interpret"))
def cqt_octave_pallas(y_padded, kr, hop: int, n_fft: int, bpo: int,
                      n_frames: int, tile_t: int = 128,
                      interpret: bool = False):
    """One octave of CQT magnitudes.

    Args:
        y_padded: (L,) audio already reflect-padded by n_fft//2.
        kr: (n_fft, 2*bpo) real kernel matrix [Re | -Im].
        n_frames: number of output frames (static).
    Returns: (n_frames, bpo) float32 magnitudes.
    """
    tile_t = _choose_tile_t(tile_t, hop)
    n_tiles = -(-n_frames // tile_t)
    # ensure the last tile's (aligned) slab stays in bounds
    need = (n_tiles - 1) * tile_t * hop + _align_up(
        (tile_t - 1) * hop + n_fft, 1024)
    if y_padded.shape[0] < need:
        y_padded = jnp.pad(y_padded, (0, need - y_padded.shape[0]))

    out = pl.pallas_call(
        partial(_octave_kernel, tile_t=tile_t, hop=hop, n_fft=n_fft,
                bpo=bpo),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_t, bpo), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # audio in HBM
            pl.BlockSpec((n_fft, 2 * bpo), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_t, bpo), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(y_padded, kr)
    return out[:n_frames]
