"""On-device DSP feature frontend: constant-Q transform, harmonic CQT,
tuning estimation, and annotation rasterization.

TPU-native replacement for the reference's librosa-based preprocessing
(libdl/data_preprocessing/hcqt.py): the CQT is a per-octave complex
filterbank matmul (MXU) over recursively half-band-downsampled audio,
so audio → HCQT features never leaves the device.
"""

from .hcqt import (
    compute_hopsize_cqt,
    compute_hcqt,
    compute_efficient_hcqt,
    efficient_hcqt_device,
    hcqt,
)
from .cqt import cqt, cqt_streamed, CqtPlan, cqt_direct_numpy
from .tuning import estimate_tuning
from .annotation import (
    compute_annotation_array,
    compute_annotation_array_nooverlap,
)

__all__ = [
    "compute_hopsize_cqt",
    "compute_hcqt",
    "compute_efficient_hcqt",
    "efficient_hcqt_device",
    "hcqt",
    "cqt",
    "cqt_streamed",
    "CqtPlan",
    "cqt_direct_numpy",
    "estimate_tuning",
    "compute_annotation_array",
    "compute_annotation_array_nooverlap",
]
