"""Utilities: profiling/tracing, model summaries, plotting."""

from .profiling import StepTimer, device_sync, trace
from .summary import count_macs, model_summary
from .plot import plot_matrix

__all__ = ["StepTimer", "device_sync", "trace", "count_macs",
           "model_summary", "plot_matrix"]
