"""Same trained-model dense-vs-windowed harness as
dense_fparity_experiment.py, but for the attention-FREE families (CNN and
largekernels U-Net) where dense mode should be measure-equivalent: their
only windowed/dense difference is conv zero-padding at window edges."""
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
from multipitch_architectures_tpu.models import (BasicCnnSegmSigmoid,
                                                 SimpleUNetLargeKernels)
from multipitch_architectures_tpu.train import Trainer, TrainConfig

MEAS = ["precision", "recall", "f_measure", "cosine_sim",
        "binary_crossentropy", "euclidean_distance", "binary_accuracy",
        "soft_accuracy", "accum_energy", "roc_auc_measure",
        "average_precision_score"]

def run(name, model, epochs=4):
    train_files = [FileSpec(*synth_file(1200, seed=s)) for s in range(3)]
    test_x, test_roll = synth_file(600, seed=99)
    aug = AugmentConfig(noisestd=1e-4, compression=10.0)
    pipeline = TrainPipeline(train_files, context=75, stride=5, augment=aug,
                             target_slice=(24, 96))
    cfg = TrainConfig(max_epochs=epochs, batch_size=16, initial_lr=2e-3,
                      loss="bce", es_patience=50, scheduler=None, seed=0)
    trainer = Trainer(model, cfg)
    state = trainer.init(jnp.zeros((1, 6, 75, 216)))
    state, hist = trainer.fit(
        lambda epoch, key: pipeline.batches(key, cfg.batch_size), None,
        state=state)
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    def apply_fn(v, xw):
        return model.apply(v, xw, train=False)
    targ = test_roll[:, 24:96]
    pw_ = predict_framewise(apply_fn, variables, test_x, batch_size=50)
    pd2 = predict_dense_chunked(apply_fn, variables, test_x, chunk=512)
    mw = calculate_eval_measures(targ, pw_, MEAS, threshold=0.4)
    md = calculate_eval_measures(targ, pd2, MEAS, threshold=0.4)
    ew = calculate_mpe_measures_mireval(targ, pw_, threshold=0.4, min_pitch=24)
    ed = calculate_mpe_measures_mireval(targ, pd2, threshold=0.4, min_pitch=24)
    worst = max(max(abs(mw[k]-md[k]) for k in MEAS),
                max(abs(ew[k]-ed[k]) for k in ew))
    print(f"{name}: trained F(windowed)={mw['f_measure']:.4f} "
          f"F(dense)={md['f_measure']:.4f} "
          f"pred|d|max={np.abs(pw_-pd2).max():.4f} "
          f"WORST MEASURE DELTA={worst:.5f}", flush=True)

run("CNN", BasicCnnSegmSigmoid(n_chan_layers=(16, 16, 8, 4), n_bins_out=72))
run("Unet-largekernels", SimpleUNetLargeKernels(
    n_chan_layers=(16, 16, 8, 4), n_bins_out=72, scalefac=8))
