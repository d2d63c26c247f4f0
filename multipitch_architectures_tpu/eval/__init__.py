"""Evaluation: framewise multipitch measures, mir_eval-compatible MPE
metrics, and whole-recording batched inference."""

from .measures import (
    calculate_single_measure,
    calculate_eval_measures,
    compute_eval_measures,
    normalize_feature_sequence,
)
from .mireval import calculate_mpe_measures_mireval, midi_to_hz
from .inference import (predict_framewise, predict_framewise_sharded,
                        predict_dense, predict_dense_chunked)
from .quant import (quantized_apply_fn, quantized_conv,
                    calibrate_activation_scales, make_int8_interceptor,
                    int8_drift_report, predict_framewise_int8,
                    auto_hybrid_int8, calibrate_with_predictions,
                    quantized_serving_fn, SCALES_COLLECTION)
from .shared_inc import SharedIncForward, predict_framewise_shared

__all__ = [
    "calculate_single_measure",
    "calculate_eval_measures",
    "compute_eval_measures",
    "normalize_feature_sequence",
    "calculate_mpe_measures_mireval",
    "midi_to_hz",
    "predict_framewise",
    "predict_framewise_sharded",
    "predict_dense",
    "predict_dense_chunked",
    "quantized_apply_fn",
    "quantized_conv",
    "make_int8_interceptor",
    "calibrate_activation_scales",
    "int8_drift_report",
    "predict_framewise_int8",
    "auto_hybrid_int8",
    "calibrate_with_predictions",
    "quantized_serving_fn",
    "SCALES_COLLECTION",
    "SharedIncForward",
    "predict_framewise_shared",
]
