"""Train a small SAUnet (attention model — the risky case for dense-mode
inference) on the learnable synthetic multipitch task, then compare ALL
25 measures between the protocol-exact windowed path and the fast
dense-chunked serving mode on held-out data."""
import sys, os
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from test_learning import synth_file
from multipitch_architectures_tpu.data import AugmentConfig, FileSpec, TrainPipeline
from multipitch_architectures_tpu.eval import (calculate_eval_measures,
                                               calculate_mpe_measures_mireval,
                                               predict_framewise,
                                               predict_dense_chunked)
from multipitch_architectures_tpu.models import SimpleUNetDoubleSelfAttn
from multipitch_architectures_tpu.train import Trainer, TrainConfig

train_files = [FileSpec(*synth_file(1200, seed=s)) for s in range(3)]
test_x, test_roll = synth_file(600, seed=99)

aug = AugmentConfig(noisestd=1e-4, compression=10.0)
pipeline = TrainPipeline(train_files, context=75, stride=5, augment=aug,
                         target_slice=(24, 96))

model = SimpleUNetDoubleSelfAttn(
    n_chan_layers=(16, 16, 8, 4), n_bins_out=72, scalefac=8,
    embed_dim=64, num_heads=8, mlp_dim=128, pos_encoding="sinusoidal")
cfg = TrainConfig(max_epochs=4, batch_size=16, initial_lr=2e-3,
                  loss="bce", es_patience=50, scheduler=None, seed=0)
trainer = Trainer(model, cfg)
state = trainer.init(jnp.zeros((1, 6, 75, 216)))
state, hist = trainer.fit(
    lambda epoch, key: pipeline.batches(key, cfg.batch_size), None,
    state=state)
print("train loss:", [round(v, 4) for v in hist["train_loss"]])

variables = {"params": state.params}
if state.batch_stats:
    variables["batch_stats"] = state.batch_stats

def apply_fn(v, xw):
    return model.apply(v, xw, train=False)

targ = test_roll[:, 24:96]
pred_w = predict_framewise(apply_fn, variables, test_x, batch_size=50)
pred_d = predict_dense_chunked(apply_fn, variables, test_x, chunk=512)

MEAS = ["precision", "recall", "f_measure", "cosine_sim",
        "binary_crossentropy", "euclidean_distance", "binary_accuracy",
        "soft_accuracy", "accum_energy", "roc_auc_measure",
        "average_precision_score"]
mw = calculate_eval_measures(targ, pred_w, MEAS, threshold=0.4)
md = calculate_eval_measures(targ, pred_d, MEAS, threshold=0.4)
pw = calculate_mpe_measures_mireval(targ, pred_w, threshold=0.4, min_pitch=24)
pd_ = calculate_mpe_measures_mireval(targ, pred_d, threshold=0.4, min_pitch=24)
print(f"windowed F={mw['f_measure']:.4f}  dense F={md['f_measure']:.4f}")
print(f"pred delta: max={np.abs(pred_w-pred_d).max():.4f} "
      f"mean={np.abs(pred_w-pred_d).mean():.5f}")
worst = 0.0
for k in MEAS:
    d = abs(mw[k] - md[k]); worst = max(worst, d)
    print(f"  {k:28s} w={mw[k]:.5f} d={md[k]:.5f} delta={d:.5f}")
for k in pw:
    d = abs(pw[k] - pd_[k]); worst = max(worst, d)
    print(f"  {k:28s} w={pw[k]:.5f} d={pd_[k]:.5f} delta={d:.5f}")
print("WORST MEASURE DELTA:", worst)
