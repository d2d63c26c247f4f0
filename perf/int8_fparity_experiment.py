"""Accuracy cost of the dynamic-int8 serving mode on a TRAINED model:
train a small SAUnet on the learnable synthetic multipitch task, then
compare ALL 25 measures between the f32 windowed protocol and the same
windowed protocol with int8 convs (eval/quant.py). Unlike dense mode
(which collapses trained attention models, F 0.95->0.11), int8 keeps the
window geometry and batch composition — only conv arithmetic changes."""
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
                                               quantized_apply_fn)
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

f32_apply = lambda v, xw: model.apply(v, xw, train=False)
# quantize every conv incl. the small heads (min_kernel_elems=1) AND the
# default policy, to see whether sparing the heads matters
targ = test_roll[:, 24:96]
pred_f = predict_framewise(f32_apply, variables, test_x, batch_size=50)

MEAS = ["precision", "recall", "f_measure", "cosine_sim",
        "binary_crossentropy", "euclidean_distance", "binary_accuracy",
        "soft_accuracy", "accum_energy", "roc_auc_measure",
        "average_precision_score"]
mf = calculate_eval_measures(targ, pred_f, MEAS, threshold=0.4)
pf = calculate_mpe_measures_mireval(targ, pred_f, threshold=0.4, min_pitch=24)

from multipitch_architectures_tpu.eval import calibrate_activation_scales
from multipitch_architectures_tpu.data.windows import gather_windows

# calibration windows: a few protocol batches from a TRAINING file
cal_x = jnp.log1p(10.0 * jnp.asarray(train_files[0].inputs, jnp.float32))
cal_batches = [gather_windows(cal_x, 37 + 50 * b + np.arange(50), 75)
               for b in range(4)]
scales = calibrate_activation_scales(model, variables, cal_batches)
print(f"calibrated {len(scales)} convs")

for policy, min_elems, sc in (("default(>=4096)", 4096, None),
                              ("all-convs", 1, None),
                              ("calibrated-static", 4096, scales)):
    int8_apply = quantized_apply_fn(model, min_kernel_elems=min_elems,
                                    activation_scales=sc)
    pred_q = predict_framewise(int8_apply, variables, test_x, batch_size=50)
    mq = calculate_eval_measures(targ, pred_q, MEAS, threshold=0.4)
    pq = calculate_mpe_measures_mireval(targ, pred_q, threshold=0.4,
                                        min_pitch=24)
    print(f"\n== int8 policy {policy}")
    print(f"f32 F={mf['f_measure']:.4f}  int8 F={mq['f_measure']:.4f}")
    print(f"pred delta: max={np.abs(pred_f-pred_q).max():.5f} "
          f"mean={np.abs(pred_f-pred_q).mean():.6f}")
    worst = 0.0
    for k in MEAS:
        d = abs(mf[k] - mq[k]); worst = max(worst, d)
        print(f"  {k:28s} f32={mf[k]:.5f} int8={mq[k]:.5f} delta={d:.5f}")
    for k in pf:
        d = abs(pf[k] - pq[k]); worst = max(worst, d)
        print(f"  {k:28s} f32={pf[k]:.5f} int8={pq[k]:.5f} delta={d:.5f}")
    print("WORST MEASURE DELTA:", worst)
