"""Device-resident training pipeline.

Replaces the reference's ``ConcatDataset(per-file dataset_context) +
DataLoader(num_workers=16)`` (exp180d…py:281-288) with a TPU-native design:

1. all files' HCQTs/targets are concatenated into ONE device tensor pair
   (files padded apart by ``context`` frames so windows never straddle a
   file boundary);
2. valid window centers are precomputed per file (stride semantics exactly
   as hcqt_datasets.py:63-75);
3. an epoch is a host-side PRNG permutation of the center list;
4. each batch is one jitted gather + vmapped augmentation chain — no host
   copies, no worker processes.
"""

from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .augment import AugmentConfig, augment_batch
from .windows import gather_windows, gather_targets, window_centers


@dataclass
class FileSpec:
    """One recording: HCQT (C, T, F) and frame targets (T, n_bins).

    ``stride`` optionally overrides the pipeline stride for this file —
    the Exp4 big-mix study uses per-corpus strides (35/6/1/2/4,
    exp210d_bigmix…py:310-438, SURVEY §2.8)."""

    inputs: np.ndarray
    targets: np.ndarray
    stride: Optional[int] = None

    def __post_init__(self):
        assert self.inputs.ndim == 3 and self.targets.ndim == 2
        assert self.inputs.shape[1] == self.targets.shape[0], (
            self.inputs.shape, self.targets.shape)


class TrainPipeline:
    """Concatenated, device-resident window sampler with on-device
    augmentation.

    Args:
        files: list of :class:`FileSpec`.
        context: window length in frames (75 in all experiments).
        stride: hop between window starts (50 train / 1 test, SURVEY §2.2).
        augment: :class:`AugmentConfig` (None → eval mode: compression only).
        target_slice: (lo, hi) slice of target bins (experiments use
            (24, 96) → 72 MIDI pitches, exp180d…py:258-288).
        compression: log-compression γ when ``augment`` is None.
    """

    def __init__(self, files: Sequence[FileSpec], context: int = 75,
                 stride: int = 50, augment: Optional[AugmentConfig] = None,
                 target_slice: Optional[Tuple[int, int]] = (24, 96),
                 compression: Optional[float] = 10.0):
        self.context = context
        self.augment = augment or AugmentConfig(compression=compression)
        gap = context  # padding between files so windows never straddle
        pieces_x, pieces_y, centers = [], [], []
        offset = 0
        for f in files:
            x = np.asarray(f.inputs, np.float32)
            y = np.asarray(f.targets, np.float32)
            if target_slice is not None:
                y = y[:, target_slice[0]:target_slice[1]]
            centers.append(window_centers(x.shape[1], context,
                                          f.stride or stride,
                                          offset=offset))
            pieces_x.append(x)
            pieces_y.append(y)
            pad_x = np.zeros((x.shape[0], gap, x.shape[2]), np.float32)
            pad_y = np.zeros((gap, y.shape[1]), np.float32)
            pieces_x.append(pad_x)
            pieces_y.append(pad_y)
            offset += x.shape[1] + gap
        self.inputs = jnp.asarray(np.concatenate(pieces_x, axis=1))
        self.targets = jnp.asarray(np.concatenate(pieces_y, axis=0))
        self.centers = np.concatenate(centers) if centers else np.zeros(0, np.int64)

    def __len__(self):
        return len(self.centers)

    def _make_batch(self, key, centers):
        return _batch_impl(self.inputs, self.targets, key, centers,
                           self.augment, self.context)

    def batches(self, key, batch_size: int, shuffle: bool = True,
                drop_remainder: bool = True):
        """Yield (X, y) device batches for one epoch.

        X: (B, C, context, F) float32 (augmented + log-compressed),
        y: (B, 1, 1, n_bins).
        """
        n = len(self.centers)
        if shuffle:
            key, kperm = jax.random.split(key)
            order = np.asarray(jax.random.permutation(kperm, n))
        else:
            order = np.arange(n)
        stop = (n // batch_size) * batch_size if drop_remainder else n
        for i in range(0, stop, batch_size):
            idx = self.centers[order[i:i + batch_size]]
            if len(idx) < batch_size and drop_remainder:
                break
            key, kb = jax.random.split(key)
            yield self._make_batch(kb, jnp.asarray(idx))

    def all_windows(self, batch_size: int = 256):
        """Deterministic pass over every window in order (eval)."""
        for i in range(0, len(self.centers), batch_size):
            idx = jnp.asarray(self.centers[i:i + batch_size])
            key = jax.random.PRNGKey(0)  # unused: eval cfg has no randomness
            yield self._make_batch(key, idx)


@partial(jax.jit, static_argnames=("cfg", "context"))
def _batch_impl(inputs, targets, key, centers, cfg, context):
    x = gather_windows(inputs, centers, context)
    y = gather_targets(targets, centers)
    return augment_batch(key, x, y, cfg, context)
