"""Does auto-hybrid int8 rescue the PUnet family's drift gate?

perf/gated_mode_experiment.py measured that NO uniform static-int8
policy passes the 1e-3 worst-of-25-measures gate on the trained PUnet
(per-recording per-tensor 1.78e-3, per-channel 1.19e-3; margins and
percentiles don't help — the drift is 8-bit rounding noise near the 0.4
threshold, not range clipping). This measures the repair path the
library now ships (eval.auto_hybrid_int8): greedily demote the most
drift-damaging convs to exact f32 until the pseudo-target gate passes,
then validate the resulting hybrid policy against TRUE targets — the
number export time can never see — plus the param share left in int8.

Run on CPU (accuracy only; speed is bench.py's job). The trained
checkpoint is cached under perf/_ckpt_cache/ so policy iterations skip
the ~20 min retrain.
"""
import os
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from test_learning import synth_file

from multipitch_architectures_tpu.data import (AugmentConfig, FileSpec,
                                               TrainPipeline)
from multipitch_architectures_tpu.data.windows import gather_windows
from multipitch_architectures_tpu.eval import (auto_hybrid_int8,
                                               calculate_eval_measures,
                                               calculate_mpe_measures_mireval,
                                               predict_framewise,
                                               quantized_apply_fn)
from multipitch_architectures_tpu.models import (
    SimpleUNetDoubleSelfAttn, SimpleUNetPolyphonyClassifSoftmax)
from multipitch_architectures_tpu.train import Trainer, TrainConfig

MEAS = ["precision", "recall", "f_measure", "cosine_sim",
        "binary_crossentropy", "euclidean_distance", "binary_accuracy",
        "soft_accuracy", "accum_energy", "roc_auc_measure",
        "average_precision_score"]

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "_ckpt_cache")

train_files = [FileSpec(*synth_file(1200, seed=s)) for s in range(3)]
test_x, test_roll = synth_file(600, seed=99)
targ = test_roll[:, 24:96]


def train_cached(name, model, loss):
    """Deterministic train (seeded PRNG streams) with an on-disk cache —
    the exact configuration of perf/gated_mode_experiment.py, so cached
    checkpoints reproduce that experiment's measured numbers."""
    import flax.serialization

    path = os.path.join(CACHE, f"{name}.msgpack")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return flax.serialization.msgpack_restore(f.read())
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
    os.makedirs(CACHE, exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(
            jax.tree.map(np.asarray, variables)))
    return variables


def measures(pred):
    m = calculate_eval_measures(targ, pred, MEAS, threshold=0.4)
    m.update(calculate_mpe_measures_mireval(targ, pred, threshold=0.4,
                                            min_pitch=24))
    return m


def quantizable_param_share(variables, scales_all, excluded):
    flat = {}

    def walk(d, prefix):
        for k, v in d.items():
            if isinstance(v, dict):
                walk(v, prefix + (k,))
            elif k == "kernel":
                flat["/".join(prefix)] = v.size

    walk(variables["params"], ())
    tot = sum(flat.get(k, 0) for k in scales_all)
    ex = sum(flat.get(k, 0) for k in excluded)
    return ex, tot


FAMILIES = (
    ("PUnet", lambda: SimpleUNetPolyphonyClassifSoftmax(
        n_chan_layers=(16, 16, 8, 4), n_bins_out=72, scalefac=8,
        num_polyphony_steps=24), "multitask"),
    ("SAUnet", lambda: SimpleUNetDoubleSelfAttn(
        n_chan_layers=(16, 16, 8, 4), n_bins_out=72, scalefac=8,
        embed_dim=64, num_heads=8, mlp_dim=128,
        pos_encoding="sinusoidal"), "bce"),
)

only = sys.argv[1] if len(sys.argv) > 1 else None

for name, make_model, loss in FAMILIES:
    if only and name != only:
        continue
    model = make_model()
    print(f"\n######## {name}")
    variables = train_cached(name, model, loss)
    pred_f = predict_framewise(
        lambda v, xw: model.apply(v, xw, train=False), variables, test_x,
        batch_size=50)
    mf = measures(pred_f)
    print(f"f32 F={mf['f_measure']:.4f}")

    # per-recording calibration windows: the serving-time policy.
    # Scales from the first 4 protocol batches; the gate VERIFIES on 6
    # batches spread across the recording (round-3 finding: verifying
    # on the leading span alone passed the proxy at 5e-5 while the
    # whole-recording TRUE drift was 1.16e-3).
    test_c = jnp.log1p(10.0 * jnp.asarray(test_x, jnp.float32))
    test_xp = jnp.pad(test_c, ((0, 0), (37, 38), (0, 0)))
    rec_cal = [gather_windows(test_xp, 37 + 50 * b + np.arange(50), 75)
               for b in range(4)]
    t = test_x.shape[1]
    verify = [gather_windows(
        test_xp, 37 + int(s) + np.arange(50), 75)
        for s in np.linspace(0, t - 50, num=6)]

    policy, report = auto_hybrid_int8(model, variables, rec_cal,
                                      gate=1e-3, verbose=True,
                                      verify_windows=verify)
    print(f"pseudo-target gate: worst={report['worst']:.5f} "
          f"passed={report['passed']} excluded={list(policy['exclude'])}")

    scales_all = dict(policy["activation_scales"])
    for k in policy["exclude"]:
        scales_all[k] = None
    ex, tot = quantizable_param_share(variables, scales_all,
                                      policy["exclude"])
    print(f"f32-fallback share of quantizable conv params: "
          f"{ex}/{tot} = {100.0 * ex / max(tot, 1):.1f}%")

    pred_h = predict_framewise(
        quantized_apply_fn(model, **policy), variables, test_x,
        batch_size=50)
    mh = measures(pred_h)
    w = max(abs(mf[k] - mh[k]) for k in mf)
    pd = np.abs(np.asarray(pred_f) - np.asarray(pred_h))
    print(f"TRUE-target hybrid drift: worst-measure={w:.5f} "
          f"pred max={pd.max():.5f} mean={pd.mean():.6f} "
          f"{'PASS' if w <= 1e-3 else 'FAIL'}")
