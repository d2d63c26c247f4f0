"""Context-window index math and device-side window gathering.

The semantics mirror the reference's datasets (hcqt_datasets.py:63-75,
194-209): a window with ``context`` frames is centered at
``index*stride + context//2`` and the target is the center frame
(or ``seglength`` center frames for segment datasets).
"""

import jax
import jax.numpy as jnp
import numpy as np


def num_windows(n_frames: int, context: int, stride: int) -> int:
    """len(dataset_context) (hcqt_datasets.py:63-65)."""
    return (n_frames - context) // stride


def num_segments(n_frames: int, context: int, seglength: int,
                 stride: int) -> int:
    """len(dataset_context_segm) (hcqt_datasets.py:194-196)."""
    return (n_frames - context - seglength + stride) // stride


def window_centers(n_frames: int, context: int, stride: int,
                   offset: int = 0) -> np.ndarray:
    """Center-frame indices of every window of one file, optionally shifted
    by ``offset`` (the file's start frame in a concatenated tensor)."""
    n = num_windows(n_frames, context, stride)
    half = context // 2
    return offset + half + stride * np.arange(n, dtype=np.int64)


def gather_windows(inputs, centers, context: int):
    """Gather context windows around ``centers`` from a device-resident
    HCQT tensor.

    inputs: (C, T, F); centers: (B,) int; → (B, C, context, F).
    One vmapped dynamic_slice — the TPU-native replacement for the
    reference's per-item host slicing (hcqt_datasets.py:74).
    """
    c, t, f = inputs.shape
    half = context // 2

    def one(center):
        return jax.lax.dynamic_slice(
            inputs, (0, center - half, 0), (c, context, f))

    return jax.vmap(one)(jnp.asarray(centers))


def gather_targets(targets, centers):
    """targets: (T, n_bins); centers: (B,) → (B, 1, 1, n_bins)."""
    y = jnp.take(targets, jnp.asarray(centers), axis=0)
    return y[:, None, None, :]
