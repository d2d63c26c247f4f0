"""Why does exp180e (24M-param SAUnet:XL) plateau on the synthetic task?

The small SAUnet (scalefac 8, embed 64) drops BCE 0.087 -> 0.011 in 4
epochs on the learnable synthetic corpus, but the exp180e geometry sits
at 0.579 +- 0.002 for 20 epochs at lr 5e-4 and 2e-3 (measured,
results_r5_fullsize_trained_gate.txt) — consistent with a constant
output ~0.4, i.e. gradients not moving even the output bias. This
ladder isolates the ingredient on the real chip: lr sweep, dropout off,
and the exp180d geometry, 3 epochs each, printing loss history and the
prediction mean/std on a probe batch after training.

Run: MULTIPITCH_GATE_PLATFORM=axon python perf/fullsize_train_diag.py
"""
import os
import sys

import numpy as np
import jax

jax.config.update("jax_platforms",
                  os.environ.get("MULTIPITCH_GATE_PLATFORM", "cpu"))
jax.config.update("jax_compilation_cache_dir",
                  "/tmp/multipitch_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from test_learning import synth_file

from multipitch_architectures_tpu.data import (AugmentConfig, FileSpec,
                                               TrainPipeline)
from multipitch_architectures_tpu.data.windows import gather_windows
from multipitch_architectures_tpu.experiments import load_experiment
from multipitch_architectures_tpu.train import Trainer, TrainConfig

train_files = [FileSpec(*synth_file(1200, seed=s)) for s in range(3)]
probe_x, _ = synth_file(200, seed=7)
probe_c = jnp.log1p(10.0 * jnp.asarray(probe_x, jnp.float32))
probe_w = gather_windows(jnp.pad(probe_c, ((0, 0), (37, 38), (0, 0))),
                         37 + np.arange(16), 75)


def run(tag, model, epochs=3, lr=5e-4):
    aug = AugmentConfig(noisestd=1e-4, compression=10.0)
    pipeline = TrainPipeline(train_files, context=75, stride=5, augment=aug,
                             target_slice=(24, 96))
    tc = TrainConfig(max_epochs=epochs, batch_size=16, initial_lr=lr,
                     loss="bce", es_patience=epochs, scheduler=None, seed=0)
    trainer = Trainer(model, tc)
    state = trainer.init(jnp.zeros((1, 6, 75, 216)))
    v0 = {"params": state.params}
    if state.batch_stats:
        v0["batch_stats"] = state.batch_stats
    p0 = np.asarray(model.apply(v0, probe_w, train=False)).ravel()
    state, hist = trainer.fit(
        lambda epoch, key: pipeline.batches(key, tc.batch_size), None,
        state=state)
    v1 = {"params": state.params}
    if state.batch_stats:
        v1["batch_stats"] = state.batch_stats
    p1 = np.asarray(model.apply(v1, probe_w, train=False)).ravel()
    print(f"{tag:40s} loss={['%.4f' % v for v in hist['train_loss']]} "
          f"pred0 mean/std={p0.mean():.3f}/{p0.std():.3f} "
          f"pred1 mean/std={p1.mean():.3f}/{p1.std():.3f}")
    sys.stdout.flush()


cfg_e = load_experiment("exp180e_musicnet_unet_insanelylarge_doubleselfattn")
cfg_d = load_experiment("exp180d_musicnet_unet_extremelylarge_doubleselfattn")

import dataclasses

run("exp180e lr=5e-4 (baseline, known flat)", cfg_e.build_model(),
    epochs=2)
run("exp180e lr=2e-3", cfg_e.build_model(), epochs=2, lr=2e-3)
run("exp180e lr=1e-4", cfg_e.build_model(), epochs=2, lr=1e-4)
run("exp180e dropout=0 lr=5e-4",
    dataclasses.replace(cfg_e.build_model(), p_dropout=0.0), epochs=2)
run("exp180d lr=5e-4", cfg_d.build_model(), epochs=2)
