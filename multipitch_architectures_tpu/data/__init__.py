"""Data pipeline: context windowing, on-device augmentation, batching.

TPU-native replacement for the reference's torch Dataset/DataLoader stack
(libdl/data_loaders/hcqt_datasets.py): windows are XLA gathers over
device-resident HCQT tensors, augmentations are pure functions of a PRNG
key (vmapped over the batch inside one jit), and an epoch is a shuffled
permutation of window-center indices. Reference-compatible Dataset classes
are provided for API parity.
"""

from .augment import (
    AugmentConfig,
    augment_batch,
    log_compress,
    random_eq,
    random_noise,
    random_transposition,
    random_tuning_shift,
    time_scale,
)
from .windows import (
    gather_windows,
    num_windows,
    num_segments,
    window_centers,
)
from .pipeline import TrainPipeline, FileSpec
from .datasets import (
    dataset_context,
    dataset_context_segm,
    dataset_context_segm_pitch,
    dataset_context_segm_widetarget,
    dataset_context_measuresegm,
)

__all__ = [
    "AugmentConfig",
    "augment_batch",
    "log_compress",
    "random_eq",
    "random_noise",
    "random_transposition",
    "random_tuning_shift",
    "time_scale",
    "gather_windows",
    "num_windows",
    "num_segments",
    "window_centers",
    "TrainPipeline",
    "FileSpec",
    "dataset_context",
    "dataset_context_segm",
    "dataset_context_segm_pitch",
    "dataset_context_segm_widetarget",
    "dataset_context_measuresegm",
]
