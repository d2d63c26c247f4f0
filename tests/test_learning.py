"""End-to-end learning test: the full pipeline (windowing + augmentation +
trainer + framewise eval) must actually LEARN a synthetic multi-pitch
task, not just decrease its loss.

Synthetic task: HCQT-like inputs built from harmonic templates — an
active MIDI pitch p lights up bin 3·(p-24)+1 and its octave/fifth
partials across the 6 channels with the channel layout the real HCQT
produces, plus noise. A small CNN must recover the center-frame pitch
activity with high F-measure on held-out data after a few epochs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multipitch_architectures_tpu.data import (AugmentConfig, FileSpec,
                                               TrainPipeline)
from multipitch_architectures_tpu.eval import (calculate_eval_measures,
                                               predict_framewise)
from multipitch_architectures_tpu.models import BasicCnnSegmSigmoid
from multipitch_architectures_tpu.train import Trainer, TrainConfig

N_BINS = 72  # MIDI 24..96


def synth_file(n_frames, seed, max_poly=4):
    """(inputs (6, T, 216), targets (T, 120-ish slice-ready)) with
    harmonic structure: channel h responds at the f0 bin of active
    pitches shifted by the (sub)harmonic's bin offset."""
    rng = np.random.RandomState(seed)
    # note events: pitches active for runs of 10-40 frames
    roll = np.zeros((n_frames, 128), np.float32)
    t = 0
    while t < n_frames:
        dur = rng.randint(10, 40)
        for p in rng.choice(np.arange(30, 90), rng.randint(1, max_poly + 1),
                            replace=False):
            roll[t:t + dur, p] = 1.0
        t += dur
    # harmonic bin offsets per channel (sub, 1, 2, 3, 4, 5)
    offsets = [-36, 0, 36, 57, 72, 83]
    x = np.zeros((6, n_frames, 216), np.float32)
    bins = 3 * (np.arange(128) - 24) + 1  # center bin of each midi pitch
    for c, off in enumerate(offsets):
        b = bins + off
        valid = (b >= 0) & (b < 216)
        amp = 1.0 / (1 + c)
        x[c][:, b[valid]] += amp * roll[:, valid]
    x += 0.05 * rng.rand(6, n_frames, 216).astype(np.float32)
    return x, roll


@pytest.mark.slow
def test_pipeline_learns_synthetic_multipitch():
    train_files = []
    for s in range(3):
        x, roll = synth_file(1200, seed=s)
        train_files.append(FileSpec(x, roll))
    test_x, test_roll = synth_file(600, seed=99)

    aug = AugmentConfig(noisestd=1e-4, compression=10.0)
    pipeline = TrainPipeline(train_files, context=75, stride=5, augment=aug,
                             target_slice=(24, 96))

    model = BasicCnnSegmSigmoid(n_chan_layers=(16, 16, 8, 4), n_bins_out=72)
    cfg = TrainConfig(max_epochs=4, batch_size=16, initial_lr=2e-3,
                      loss="bce", es_patience=50, scheduler=None, seed=0)
    trainer = Trainer(model, cfg)
    state = trainer.init(jnp.zeros((1, 6, 75, 216)))
    state, hist = trainer.fit(
        lambda epoch, key: pipeline.batches(key, cfg.batch_size),
        None, state=state)
    assert hist["train_loss"][-1] < hist["train_loss"][0] * 0.5

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    def apply_fn(v, xw):
        return model.apply(v, xw, train=False)

    pred = predict_framewise(apply_fn, variables, test_x, batch_size=128)
    targ = test_roll[:, 24:96]
    m = calculate_eval_measures(targ, pred, ["precision", "recall",
                                             "f_measure"], threshold=0.4)
    # a learned detector, not chance: the all-on baseline precision here
    # is ~0.03, so F > 0.6 demonstrates real learning
    assert m["f_measure"] > 0.6, m
