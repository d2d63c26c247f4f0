"""Experiment layer: the config registry distilled from the reference's
111 scripts plus one configurable runner."""

from .configs import (
    ExperimentConfig,
    available_experiments,
    shrink_for_smoke,
    load_experiment,
    build_model,
    MODEL_REGISTRY,
    BIGMIX_STRIDES,
)
from .runner import (run_experiment, SyntheticCorpus, NpyCorpus,
                     AudioCorpus)
from .splits import (apply_split_to_config, load_split, split_datasets,
                     split_filenames)

__all__ = [
    "ExperimentConfig",
    "available_experiments",
    "shrink_for_smoke",
    "load_experiment",
    "build_model",
    "MODEL_REGISTRY",
    "BIGMIX_STRIDES",
    "run_experiment",
    "SyntheticCorpus",
    "NpyCorpus",
    "AudioCorpus",
    "apply_split_to_config",
    "load_split",
    "split_datasets",
    "split_filenames",
]
