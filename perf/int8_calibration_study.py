"""Which calibration policy pulls STATIC-scale int8 drift under the
1e-3 F-gate? (VERDICT r2 task 1a.)

Round-2 measured: dynamic per-call scales meet the gate (worst measure
delta 8e-4) but gain only +1.6% speed; calibrated static max-scales gain
+15% (48.8x) but drift 2.3e-3. This study trains BOTH flagship-family
checkpoints (SAUnet = exp180*, PUnet = exp195*) on the learnable
synthetic task and sweeps static-calibration policies:

  - static max (round-2 baseline)
  - static max with margin 1.15 / 1.25 / 1.5  (headroom vs rounding)
  - percentile 99.9 (clip outliers, finer bulk rounding)
  - static max on 12 calibration batches instead of 4
  - per-layer probe: which convs' static scales cause the drift

Run on CPU (accuracy only; the speed side is perf/int8_windowed_experiment).
"""
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
                                               calibrate_activation_scales,
                                               predict_framewise,
                                               quantized_apply_fn)
from multipitch_architectures_tpu.data.windows import gather_windows
from multipitch_architectures_tpu.models import (
    SimpleUNetDoubleSelfAttn, SimpleUNetDoubleSelfAttnPolyphony)
from multipitch_architectures_tpu.train import Trainer, TrainConfig

MEAS = ["precision", "recall", "f_measure", "cosine_sim",
        "binary_crossentropy", "euclidean_distance", "binary_accuracy",
        "soft_accuracy", "accum_energy", "roc_auc_measure",
        "average_precision_score"]

train_files = [FileSpec(*synth_file(1200, seed=s)) for s in range(3)]
test_x, test_roll = synth_file(600, seed=99)
targ = test_roll[:, 24:96]


def train(model, loss):
    aug = AugmentConfig(noisestd=1e-4, compression=10.0)
    pipeline = TrainPipeline(train_files, context=75, stride=5, augment=aug,
                             target_slice=(24, 96))
    cfg = TrainConfig(max_epochs=4, batch_size=16, initial_lr=2e-3,
                      loss=loss, es_patience=50, scheduler=None, seed=0)
    trainer = Trainer(model, cfg)
    state = trainer.init(jnp.zeros((1, 6, 75, 216)))
    state, hist = trainer.fit(
        lambda epoch, key: pipeline.batches(key, cfg.batch_size), None,
        state=state)
    print("train loss:", [round(v, 4) for v in hist["train_loss"]])
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    return variables


def measures(pred):
    m = calculate_eval_measures(targ, pred, MEAS, threshold=0.4)
    m.update(calculate_mpe_measures_mireval(targ, pred, threshold=0.4,
                                            min_pitch=24))
    return m


def worst_delta(mf, mq):
    return max(abs(mf[k] - mq[k]) for k in mf)


# calibration batches from a TRAINING file (the export-time scenario),
# in exact protocol geometry: pad ±(37,38) BEFORE gathering, like the
# serving path does. The original round-3 study run (see the note at the
# top of results_r3_int8_calibration_study.txt) gathered from the
# UNPADDED features — mis-aligned vs the windows being served — which
# pushed every static policy just past the 1e-3 gate; with protocol
# geometry, margin-1.25 static calibration passes on the same checkpoint
# (perf/gated_mode_experiment.py measures the corrected policies).
cal_x = jnp.log1p(10.0 * jnp.asarray(train_files[0].inputs, jnp.float32))
cal_xp = jnp.pad(cal_x, ((0, 0), (37, 38), (0, 0)))
def cal_batches(n):
    return [gather_windows(cal_xp, 37 + 50 * b + np.arange(50), 75)
            for b in range(n)]


for name, model, loss in (
        ("SAUnet", SimpleUNetDoubleSelfAttn(
            n_chan_layers=(16, 16, 8, 4), n_bins_out=72, scalefac=8,
            embed_dim=64, num_heads=8, mlp_dim=128,
            pos_encoding="sinusoidal"), "bce"),
        ("PUnet", SimpleUNetDoubleSelfAttnPolyphony(
            n_chan_layers=(16, 16, 8, 4), n_bins_out=72, scalefac=8,
            embed_dim=64, num_heads=8, mlp_dim=128,
            pos_encoding="sinusoidal"), "multitask")):
    print(f"\n######## {name}")
    variables = train(model, loss)
    f32_apply = lambda v, xw: model.apply(v, xw, train=False)
    pred_f = predict_framewise(f32_apply, variables, test_x, batch_size=50)
    mf = measures(pred_f)
    print(f"f32 F={mf['f_measure']:.4f}")

    policies = [("dynamic", dict(sc="dyn"))]
    for tag, kw in (("static-max", {}),
                    ("static-m1.15", dict(margin=1.15)),
                    ("static-m1.25", dict(margin=1.25)),
                    ("static-m1.5", dict(margin=1.5)),
                    ("pct99.9", dict(percentile=99.9)),
                    ("pct99.9-m1.25", dict(percentile=99.9, margin=1.25))):
        policies.append((tag + "-cal4", dict(sc=("cal", 4, kw))))
    policies.append(("static-max-cal12", dict(sc=("cal", 12, {}))))

    scale_cache = {}
    results = {}
    for tag, p in policies:
        if p["sc"] == "dyn":
            sc = None
        else:
            _, n, kw = p["sc"]
            key = (n, tuple(sorted(kw.items())))
            if key not in scale_cache:
                scale_cache[key] = calibrate_activation_scales(
                    model, variables, cal_batches(n), **kw)
            sc = scale_cache[key]
        apply_q = quantized_apply_fn(model, activation_scales=sc)
        pred_q = predict_framewise(apply_q, variables, test_x, batch_size=50)
        w = worst_delta(mf, measures(pred_q))
        pd = np.abs(pred_f - pred_q)
        results[tag] = w
        print(f"{tag:18s} worst-measure={w:.5f} "
              f"pred max={pd.max():.5f} mean={pd.mean():.6f} "
              f"{'PASS' if w <= 1e-3 else 'fail'}")

    # per-layer probe on the static-max baseline: quantize ALL convs with
    # dynamic scales EXCEPT one, which gets its static scale — the pred
    # drift increase attributes the static-scale damage per layer
    base = scale_cache[(4, ())]
    apply_dyn = quantized_apply_fn(model, activation_scales=None)
    pred_dyn = predict_framewise(apply_dyn, variables, test_x, batch_size=50)
    print("per-layer static damage (pred max-delta vs all-dynamic):")
    for k in sorted(base):
        apply_q = quantized_apply_fn(model, activation_scales={k: base[k]})
        pred_q = predict_framewise(apply_q, variables, test_x, batch_size=50)
        print(f"  {k:40s} {np.abs(pred_dyn - pred_q).max():.5f}")
