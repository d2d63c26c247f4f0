"""End-to-end checkpoint parity: the SAME torch state_dict evaluated
through (a) the reference protocol in torch (pad, stride-1 windows,
batch-50 loader, metrics) and (b) this framework's ported checkpoint +
predict_framewise + metric engine must give matching predictions and
F-measures. This is the executable version of the BASELINE 1e-3
F-measure gate, runnable without the stripped MusicNet data (synthetic
HCQT stands in; the protocol and numerics are what is being compared).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multipitch_architectures_tpu.eval import (calculate_eval_measures,
                                               calculate_mpe_measures_mireval,
                                               predict_framewise)
from multipitch_architectures_tpu.models import (
    SimpleUNetDoubleSelfAttn, SimpleUNetPolyphonyClassifSoftmax, port)

from conftest import patched_torch_cpu, reference_models

ALL_EVAL_MEASURES = [
    "precision", "recall", "f_measure", "cosine_sim",
    "binary_crossentropy", "euclidean_distance", "binary_accuracy",
    "soft_accuracy", "accum_energy", "roc_auc_measure",
    "average_precision_score",
]


def _torch_protocol_predictions(tm, inputs, t_frames, batch=50):
    """The reference test protocol in torch (exp180d…py:417-443): log
    compression, (37, 38) pad, stride-1 windows through a batch-``batch``
    loader, tuple outputs taking y_pred."""
    import torch

    half = 37
    x = np.log1p(10.0 * inputs)
    xp = np.pad(x, ((0, 0), (half, half + 1), (0, 0)))
    preds = []
    with torch.no_grad():
        for start in range(0, t_frames, batch):
            idx = np.arange(start, min(start + batch, t_frames))
            wins = np.stack([xp[:, i:i + 75, :] for i in idx])
            y = tm(torch.from_numpy(wins))
            if isinstance(y, tuple):
                y = y[0]
            preds.append(y.squeeze(2).squeeze(1).numpy())
    return np.concatenate(preds)


def test_same_checkpoint_same_fmeasure_as_reference_protocol():
    ref = reference_models()
    if ref is None:
        pytest.skip("reference torch models unavailable")
    import torch

    kw = dict(n_chan_layers=[8, 8, 4, 2], n_bins_out=72, scalefac=16,
              embed_dim=32, num_heads=8, mlp_dim=64,
              pos_encoding="sinusoidal")
    torch.manual_seed(0)
    with patched_torch_cpu():
        tm = ref.simple_u_net_doubleselfattn(**kw)
    tm.eval()
    sd = tm.state_dict()

    rng = np.random.RandomState(7)
    t_frames = 120
    inputs = rng.rand(6, t_frames, 216).astype(np.float32)  # raw HCQT
    targets = (rng.rand(t_frames, 72) > 0.9).astype(np.float32)

    # -- (a) reference protocol in torch (exp180d…py:417-443) ------------
    half = 37
    x = np.log1p(10.0 * inputs)
    xp = np.pad(x, ((0, 0), (half, half + 1), (0, 0)))
    preds = []
    with torch.no_grad():
        for start in range(0, t_frames, 50):       # test batch_size 50
            idx = np.arange(start, min(start + 50, t_frames))
            wins = np.stack([xp[:, i:i + 75, :] for i in idx])
            y = tm(torch.from_numpy(wins))
            preds.append(y.squeeze(2).squeeze(1).numpy())
    want_pred = np.concatenate(preds)

    # -- (b) this framework: ported checkpoint + predict_framewise -------
    variables = jax.tree.map(jnp.asarray, port.port_unet_auto(sd))
    model = SimpleUNetDoubleSelfAttn(
        **{k: (tuple(v) if isinstance(v, list) else v) for k, v in kw.items()})

    def apply_fn(v, xw):
        return model.apply(v, xw, train=False)

    got_pred = predict_framewise(apply_fn, variables, inputs, batch_size=50)

    assert got_pred.shape == want_pred.shape == (t_frames, 72)
    np.testing.assert_allclose(got_pred, want_pred, atol=2e-4, rtol=1e-2)

    measures = ["precision", "recall", "f_measure", "cosine_sim",
                "soft_accuracy"]
    ours = calculate_eval_measures(targets, got_pred, measures,
                                   threshold=0.4)
    theirs = calculate_eval_measures(targets, want_pred, measures,
                                     threshold=0.4)
    for m in measures:
        assert abs(ours[m] - theirs[m]) < 1e-3, (m, ours[m], theirs[m])


@pytest.mark.slow
@pytest.mark.parametrize("which", ["saunet_l", "punet_xl"])
def test_fullsize_checkpoint_parity(which):
    """The BASELINE 1e-3 F-measure gate at PAPER scale: the exact exp180d
    SAUnet:L (scalefac 4, embed 128, mlp 8192, sinusoidal PE — 8.1M
    params) and exp195f PUnet:XL (scalefac 2, 24 polyphony steps — 14.6M
    params) configs, 500 frames through BOTH protocols. Exercises the
    600-token positional-encoding path, the full bottleneck geometry and
    fp32 accumulation at real model size — tiny-config parity does not."""
    ref = reference_models()
    if ref is None:
        pytest.skip("reference torch models unavailable")
    import torch

    torch.manual_seed(0)
    if which == "saunet_l":
        kw = dict(n_chan_layers=[128, 80, 50, 30], n_bins_out=72,
                  scalefac=4, embed_dim=128, num_heads=8, mlp_dim=8192,
                  pos_encoding="sinusoidal")  # exp180d…py:73-85
        with patched_torch_cpu():
            tm = ref.simple_u_net_doubleselfattn(**kw)
        model = SimpleUNetDoubleSelfAttn(**{
            k: (tuple(v) if isinstance(v, list) else v)
            for k, v in kw.items()})
    else:
        kw = dict(n_chan_layers=[128, 180, 150, 100], n_bins_out=72,
                  scalefac=2, num_polyphony_steps=24)  # exp195f…py:73-82
        with patched_torch_cpu():
            tm = ref.simple_u_net_polyphony_classif_softmax(**kw)
        model = SimpleUNetPolyphonyClassifSoftmax(**{
            k: (tuple(v) if isinstance(v, list) else v)
            for k, v in kw.items()})
    tm.eval()
    sd = tm.state_dict()

    rng = np.random.RandomState(11)
    t_frames = 500
    inputs = rng.rand(6, t_frames, 216).astype(np.float32)
    targets = (rng.rand(t_frames, 72) > 0.9).astype(np.float32)

    want_pred = _torch_protocol_predictions(tm, inputs, t_frames)

    variables = jax.tree.map(jnp.asarray, port.port_unet_auto(sd))

    def apply_fn(v, xw):
        return model.apply(v, xw, train=False)

    got_pred = predict_framewise(apply_fn, variables, inputs, batch_size=50)

    assert got_pred.shape == want_pred.shape == (t_frames, 72)
    np.testing.assert_allclose(got_pred, want_pred, atol=2e-4, rtol=1e-2)

    # all 11 eval measures + all 14 mir_eval measures within 1e-3
    ours = calculate_eval_measures(targets, got_pred, ALL_EVAL_MEASURES,
                                   threshold=0.4)
    theirs = calculate_eval_measures(targets, want_pred, ALL_EVAL_MEASURES,
                                     threshold=0.4)
    for m in ALL_EVAL_MEASURES:
        assert abs(ours[m] - theirs[m]) < 1e-3, (m, ours[m], theirs[m])
    ours_mpe = calculate_mpe_measures_mireval(targets, got_pred,
                                              threshold=0.4, min_pitch=24)
    theirs_mpe = calculate_mpe_measures_mireval(targets, want_pred,
                                                threshold=0.4, min_pitch=24)
    for m, v in ours_mpe.items():
        assert abs(v - theirs_mpe[m]) < 1e-3, (m, v, theirs_mpe[m])
