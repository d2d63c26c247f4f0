"""Utilities: profiling/tracing, model summaries, plotting."""

from .profiling import StepTimer, trace
from .summary import model_summary
from .plot import plot_matrix

__all__ = ["StepTimer", "trace", "model_summary", "plot_matrix"]
