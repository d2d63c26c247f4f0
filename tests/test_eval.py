"""Tests for the evaluation stack: measures vs hand-computed/sklearn
oracles, mir_eval-compatible MPE metrics, framewise-vs-dense inference
equivalence on the CNN family."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multipitch_architectures_tpu.eval import (
    calculate_eval_measures,
    calculate_mpe_measures_mireval,
    calculate_single_measure,
    compute_eval_measures,
    midi_to_hz,
    normalize_feature_sequence,
    predict_dense,
    predict_framewise,
)
from multipitch_architectures_tpu.models import BasicCnnSegmSigmoid


def test_compute_eval_measures_counts():
    ref = np.array([[1, 0, 1], [0, 1, 0]])
    est = np.array([[1, 1, 0], [0, 1, 0]])
    p, r, f, tp, fp, fn = compute_eval_measures(ref, est)
    assert (tp, fp, fn) == (2, 1, 1)
    assert p == pytest.approx(2 / 3)
    assert r == pytest.approx(2 / 3)
    assert f == pytest.approx(2 / 3)


def test_compute_eval_measures_zero_tp():
    p, r, f, tp, fp, fn = compute_eval_measures(np.eye(3), 1 - np.eye(3))
    assert (p, r, f) == (0, 0, 0)


def test_measures_against_manual():
    rng = np.random.RandomState(0)
    targ = (rng.rand(50, 72) > 0.9).astype(float)
    pred = np.clip(targ * 0.8 + rng.rand(50, 72) * 0.3, 0, 1)
    m = calculate_eval_measures(
        targ, pred,
        ["precision", "recall", "f_measure", "cosine_sim",
         "binary_crossentropy", "euclidean_distance", "binary_accuracy",
         "soft_accuracy", "accum_energy", "roc_auc_measure",
         "average_precision_score"],
        threshold=0.4)
    # manual recomputation of a few
    pt = pred >= 0.4
    tp = np.logical_and(targ, pt).sum()
    assert m["precision"] == pytest.approx(tp / pt.sum())
    assert m["recall"] == pytest.approx(tp / targ.sum())
    eps = np.finfo(float).eps
    bce = -np.mean(targ * np.log2(pred + eps)
                   + (1 - targ) * np.log2(1 - pred + eps))
    assert m["binary_crossentropy"] == pytest.approx(bce)  # log2 quirk
    assert 0.5 < m["roc_auc_measure"] <= 1.0
    assert 0 < m["average_precision_score"] <= 1.0
    assert m["soft_accuracy"] == pytest.approx(
        np.mean(targ * pred + (1 - targ) * (1 - pred)))


def test_cosine_sim_zero_frame_unit_vector():
    """All-zero frames become unit vectors (threshold 1e-10) so two empty
    frames have similarity 1 — the reference's libfmp behavior."""
    targ = np.zeros((4, 12))
    pred = np.zeros((4, 12))
    assert calculate_single_measure(targ, pred, "cosine_sim") == \
        pytest.approx(1.0)


def test_normalize_feature_sequence():
    x = np.array([[3.0, 0.0], [4.0, 0.0]])
    out = normalize_feature_sequence(x, threshold=1e-10)
    np.testing.assert_allclose(out[:, 0], [0.6, 0.8])
    np.testing.assert_allclose(out[:, 1], [1 / np.sqrt(2)] * 2)


def test_midi_to_hz():
    assert midi_to_hz(69) == pytest.approx(440.0)
    assert midi_to_hz(60) == pytest.approx(261.6255653, rel=1e-9)


def test_mireval_perfect_prediction():
    targ = (np.random.RandomState(1).rand(30, 72) > 0.85).astype(float)
    m = calculate_mpe_measures_mireval(targ, targ, threshold=0.5)
    assert m["Precision"] == 1.0 and m["Recall"] == 1.0
    assert m["Accuracy"] == 1.0 and m["Total Error"] == 0.0
    assert m["Chroma Precision"] == 1.0 and m["Chroma Total Error"] == 0.0


def test_mireval_counts_hand_example():
    # frame 0: ref {24, 36}, est {24, 40}  → TP 1, sub 1
    # frame 1: ref {30},     est {}        → miss 1
    # frame 2: ref {},       est {50, 51}  → fa 2
    targ = np.zeros((3, 72))
    est = np.zeros((3, 72))
    targ[0, [0, 12]] = 1
    est[0, [0, 16]] = 1
    targ[1, 6] = 1
    est[2, [26, 27]] = 1
    m = calculate_mpe_measures_mireval(targ, est, threshold=0.5, min_pitch=24)
    assert m["Precision"] == pytest.approx(1 / 4)
    assert m["Recall"] == pytest.approx(1 / 3)
    assert m["Accuracy"] == pytest.approx(1 / 6)  # TP/(TP+FP+FN)=1/(1+3+2)
    assert m["Substitution Error"] == pytest.approx(1 / 3)
    assert m["Miss Error"] == pytest.approx(1 / 3)
    assert m["False Alarm Error"] == pytest.approx(2 / 3)
    assert m["Total Error"] == pytest.approx(4 / 3)
    # chroma: frame0 ref pcs {0, 0}={0:2}, est {0:1, 4:1} → TP 1
    assert m["Chroma Recall"] == pytest.approx(1 / 3)


def test_mireval_matches_hand_derived_unit_vectors():
    """Committed data goldens (tests/goldens/mireval_unit_vectors.json):
    hand-derived exact-rational expectations for mir_eval.multipitch
    semantics (Bay et al. 2009 count definitions; the reference consumes
    them at eval_metrics.py:158-189). mir_eval itself is not installable
    offline, so these transcribed vectors are the third-party referee for
    the production bin-counting engine."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "goldens",
                        "mireval_unit_vectors.json")
    with open(path) as f:
        golden = json.load(f)
    for sc in golden["scenarios"]:
        n_frames = len(sc["ref"])
        targ = np.zeros((n_frames, sc["n_bins"]))
        est = np.zeros((n_frames, sc["n_bins"]))
        for t, bins in enumerate(sc["ref"]):
            targ[t, bins] = 1
        for t, bins in enumerate(sc["est"]):
            est[t, bins] = 1
        m = calculate_mpe_measures_mireval(targ, est, threshold=0.5,
                                           min_pitch=sc["min_pitch"])
        assert set(m) == set(sc["expected"]), sc["name"]
        for key, want in sc["expected"].items():
            assert m[key] == pytest.approx(want, abs=1e-12), \
                f"{sc['name']}: {key} = {m[key]} != {want}"


def test_mireval_chroma_octave_fold():
    """Octave errors are forgiven in the chroma measures."""
    targ = np.zeros((1, 72))
    est = np.zeros((1, 72))
    targ[0, 0] = 1    # MIDI 24 (C)
    est[0, 12] = 1    # MIDI 36 (C, one octave up)
    m = calculate_mpe_measures_mireval(targ, est, min_pitch=24)
    assert m["Precision"] == 0.0
    assert m["Chroma Precision"] == 1.0 and m["Chroma Recall"] == 1.0


def test_framewise_matches_reference_protocol():
    """predict_framewise must reproduce the reference's per-window loop
    (pad ±(37,38), stride-1 dataset_context slices) exactly."""
    rng = np.random.RandomState(0)
    inputs = rng.rand(6, 90, 216).astype(np.float32)
    model = BasicCnnSegmSigmoid(n_chan_layers=(8, 8, 4, 2), n_bins_out=72)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 6, 75, 216)), train=False)

    def apply_fn(variables, x):
        return model.apply(variables, x, train=False)

    yw = predict_framewise(apply_fn, v, inputs, batch_size=50)

    # manual reference protocol (exp180d...py:427-443)
    half = 75 // 2
    x = np.log1p(10.0 * inputs)
    xp = np.pad(x, ((0, 0), (half, half + 1), (0, 0)))
    wins = np.stack([xp[:, i:i + 75, :] for i in range(90)])
    want = np.asarray(model.apply(v, jnp.asarray(wins), train=False)
                      ).reshape(90, 72)
    np.testing.assert_allclose(yw, want, atol=2e-6)


def test_dense_close_to_windowed_for_cnn():
    """predict_dense sees real context where the windowed protocol
    zero-pads, so outputs differ slightly — but must stay strongly
    correlated (it's the documented fast mode, not a parity mode)."""
    rng = np.random.RandomState(0)
    inputs = rng.rand(6, 160, 216).astype(np.float32)
    # temporally smooth input (like real HCQT); random-noise input with a
    # random-init model is the worst case for the padding difference
    kernel = np.ones(9) / 9
    inputs = np.apply_along_axis(
        lambda a: np.convolve(a, kernel, mode="same"), 1, inputs)
    model = BasicCnnSegmSigmoid(n_chan_layers=(8, 8, 4, 2), n_bins_out=72)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 6, 75, 216)), train=False)

    def apply_fn(variables, x):
        return model.apply(variables, x, train=False)

    yw = predict_framewise(apply_fn, v, inputs, batch_size=50)
    yd = predict_dense(apply_fn, v, inputs)
    assert yd.shape == yw.shape == (160, 72)
    corr = np.corrcoef(yw.flatten(), yd.flatten())[0, 1]
    assert corr > 0.95, corr


def test_dense_chunked_matches_full_dense_away_from_chunk_edges():
    """Chunked-dense equals full-dense except near chunk boundaries
    (where per-chunk zero padding replaces true context)."""
    from multipitch_architectures_tpu.eval import predict_dense_chunked

    rng = np.random.RandomState(0)
    inputs = rng.rand(6, 200, 216).astype(np.float32)
    model = BasicCnnSegmSigmoid(n_chan_layers=(8, 8, 4, 2), n_bins_out=72)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 6, 75, 216)), train=False)

    def apply_fn(variables, x):
        return model.apply(variables, x, train=False)

    yd = predict_dense(apply_fn, v, inputs)
    yc = predict_dense_chunked(apply_fn, v, inputs, chunk=100)
    assert yc.shape == (200, 72)
    # interior of first chunk (frames 0..60, away from the 100 boundary)
    np.testing.assert_allclose(yc[:55], yd[:55], atol=2e-5)


# ---------------------------------------------------------------------------
# mir_eval algorithm-path fuzz: production bin counting vs an independent
# reimplementation of mir_eval.multipitch.evaluate's published pipeline
# (Hz -> float MIDI -> 50-cent bipartite matching; tests/mireval_oracle.py)
# ---------------------------------------------------------------------------

def _roll_to_freqs(roll, min_pitch):
    """The reference's exact conversion (eval_metrics.py:183-185)."""
    return [midi_to_hz(min_pitch + np.flatnonzero(roll[k]))
            for k in range(roll.shape[0])]


@pytest.mark.parametrize("seed,density,frames", [
    (0, 0.10, 60), (1, 0.03, 40), (2, 0.30, 25), (3, 0.70, 10),
    (4, 0.0, 12),   # empty estimate frames
    (5, 0.5, 1),    # single frame
])
def test_mireval_engine_matches_independent_oracle(seed, density, frames):
    import mireval_oracle

    rng = np.random.RandomState(seed)
    targ = (rng.rand(frames, 72) > 0.9).astype(float)
    est = (rng.rand(frames, 72) < density).astype(float)
    min_pitch = 24
    fs = 43.066406250
    times = np.arange(frames) / fs
    want = mireval_oracle.evaluate(
        times, _roll_to_freqs(targ > 0, min_pitch),
        times, _roll_to_freqs(est > 0, min_pitch))
    got = calculate_mpe_measures_mireval(targ, est, threshold=0.5,
                                         min_pitch=min_pitch)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k


def test_mireval_engine_matches_oracle_empty_reference():
    import mireval_oracle

    frames = 8
    targ = np.zeros((frames, 72))
    est = (np.random.RandomState(9).rand(frames, 72) < 0.2).astype(float)
    times = np.arange(frames)
    want = mireval_oracle.evaluate(
        times, _roll_to_freqs(targ > 0, 24),
        times, _roll_to_freqs(est > 0, 24))
    got = calculate_mpe_measures_mireval(targ, est, threshold=0.5,
                                         min_pitch=24)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k


def test_predict_framewise_grouped_matches_plain_protocol():
    """predict_framewise with a 'cross_batch:50' model at batch 200 must
    reproduce the plain model at protocol batch 50 (incl. a tail that is
    neither a multiple of the batch nor of the group)."""
    from multipitch_architectures_tpu.models import SimpleUNetDoubleSelfAttn

    kw = dict(n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
              embed_dim=32, num_heads=8, mlp_dim=64,
              pos_encoding="sinusoidal")
    plain = SimpleUNetDoubleSelfAttn(**kw)
    grouped = SimpleUNetDoubleSelfAttn(**kw, attn_mode="cross_batch:50")
    variables = plain.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 6, 75, 216)), train=False)

    t_frames = 283  # 5 full batches of 50 + tail 33
    inputs = np.random.RandomState(5).rand(6, t_frames, 216).astype(np.float32)

    want = predict_framewise(
        lambda v, xw: plain.apply(v, xw, train=False), variables, inputs,
        batch_size=50)
    got = predict_framewise(
        lambda v, xw: grouped.apply(v, xw, train=False), variables, inputs,
        batch_size=200, group=50)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_quantized_apply_close_to_f32_and_policy_respected():
    """Dynamic-int8 serving mode (eval/quant.py): the quantized forward
    stays close to f32 on a U-Net (bounded per-layer quantization error),
    actually changes the arithmetic, and a threshold above every kernel
    size degenerates to the exact f32 path."""
    from multipitch_architectures_tpu.eval import quantized_apply_fn
    from multipitch_architectures_tpu.models import SimpleUNetDoubleSelfAttn

    model = SimpleUNetDoubleSelfAttn(
        n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
        embed_dim=32, num_heads=8, mlp_dim=64)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 6, 75, 216),
                    jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    f32 = np.asarray(jax.jit(
        lambda v, xi: model.apply(v, xi, train=False))(variables, x))

    q = np.asarray(jax.jit(quantized_apply_fn(model))(variables, x))
    assert q.shape == f32.shape
    assert (q != f32).any()                       # int8 path actually taken
    assert np.abs(q - f32).max() < 5e-3           # sigmoid-output error bound

    noop = np.asarray(jax.jit(quantized_apply_fn(
        model, min_kernel_elems=1 << 30))(variables, x))
    np.testing.assert_array_equal(noop, f32)


def test_quantized_static_scales_close_to_f32():
    """Calibrated static-scale int8 (the fast serving variant): scales
    captured from representative windows keep the forward close to f32,
    and every big conv gets a calibrated scale."""
    from multipitch_architectures_tpu.eval import (
        calibrate_activation_scales, quantized_apply_fn)
    from multipitch_architectures_tpu.models import SimpleUNetDoubleSelfAttn

    model = SimpleUNetDoubleSelfAttn(
        n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
        embed_dim=32, num_heads=8, mlp_dim=64)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 6, 75, 216), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    scales = calibrate_activation_scales(model, variables, [x])
    assert len(scales) >= 10 and all(v > 0 for v in scales.values())

    f32 = np.asarray(jax.jit(
        lambda v, xi: model.apply(v, xi, train=False))(variables, x))
    q = np.asarray(jax.jit(quantized_apply_fn(
        model, activation_scales=scales))(variables, x))
    assert (q != f32).any()
    assert np.abs(q - f32).max() < 5e-3


def test_quantized_per_channel_scales_finer_than_per_tensor():
    """Per-input-channel static activation scales (the gated serving
    policy): vector scales per conv, forward at least as close to f32 as
    per-tensor on channel-imbalanced inputs, and the fold-into-kernel
    identity holds (sum_cin (x/s_c)(w*s_c) == sum_cin x*w)."""
    from multipitch_architectures_tpu.eval import (
        calibrate_activation_scales, quantized_apply_fn)
    from multipitch_architectures_tpu.models import SimpleUNetDoubleSelfAttn

    model = SimpleUNetDoubleSelfAttn(
        n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
        embed_dim=32, num_heads=8, mlp_dim=64)
    rng = np.random.RandomState(3)
    # imbalance the 6 HCQT harmonic channels to stress per-tensor scales
    x = rng.rand(2, 6, 75, 216) * np.array(
        [8.0, 2.0, 1.0, 0.3, 0.1, 0.02])[None, :, None, None]
    x = jnp.asarray(x, jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    sc_t = calibrate_activation_scales(model, variables, [x])
    sc_c = calibrate_activation_scales(model, variables, [x],
                                       per_channel=True)
    assert set(sc_c) == set(sc_t)
    assert all(np.ndim(v) == 1 for v in sc_c.values())

    f32 = np.asarray(jax.jit(
        lambda v, xi: model.apply(v, xi, train=False))(variables, x))
    q_t = np.asarray(jax.jit(quantized_apply_fn(
        model, activation_scales=sc_t))(variables, x))
    q_c = np.asarray(jax.jit(quantized_apply_fn(
        model, activation_scales=sc_c))(variables, x))
    assert (q_c != f32).any()
    assert np.abs(q_c - f32).max() < 5e-3
    # NOTE: per-channel is NOT universally finer end to end — folding the
    # channel scales into the kernel widens the per-output-channel weight
    # range (coarser weight quantization), so which policy wins is an
    # empirical per-checkpoint question (perf/gated_mode_experiment.py
    # measures both on trained checkpoints); here we only pin that both
    # stay within the serving error bound.
    assert np.abs(q_t - f32).max() < 5e-3


def test_quantized_exclude_keeps_layers_f32():
    """The hybrid-policy tier: paths in ``exclude`` run the exact f32
    conv — excluding every quantized conv reproduces the f32 forward
    bit-exactly, excluding a strict subset still differs from f32."""
    from multipitch_architectures_tpu.eval import (
        calibrate_activation_scales, quantized_apply_fn)
    from multipitch_architectures_tpu.models import SimpleUNetDoubleSelfAttn

    model = SimpleUNetDoubleSelfAttn(
        n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
        embed_dim=32, num_heads=8, mlp_dim=64)
    x = jnp.asarray(np.random.RandomState(5).rand(2, 6, 75, 216),
                    jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                           train=False)
    scales = calibrate_activation_scales(model, variables, [x])
    assert scales                                   # something quantizes

    f32 = np.asarray(jax.jit(
        lambda v, xi: model.apply(v, xi, train=False))(variables, x))
    all_f32 = np.asarray(jax.jit(quantized_apply_fn(
        model, activation_scales=scales,
        exclude=tuple(scales)))(variables, x))
    np.testing.assert_array_equal(all_f32, f32)

    part = np.asarray(jax.jit(quantized_apply_fn(
        model, activation_scales=scales,
        exclude=tuple(sorted(scales))[:1]))(variables, x))
    assert (part != f32).any()


@pytest.mark.slow
def test_auto_hybrid_int8_demotes_until_gate():
    """auto_hybrid_int8 greedily demotes convs to f32: an impossible
    (negative) gate forces full demotion — the returned policy excludes
    every quantized conv, reproduces f32 exactly, and reports zero
    drift; a generous gate returns the untouched full-static policy."""
    from multipitch_architectures_tpu.eval import (auto_hybrid_int8,
                                                   quantized_apply_fn)
    from multipitch_architectures_tpu.models import SimpleUNetDoubleSelfAttn

    model = SimpleUNetDoubleSelfAttn(
        n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
        embed_dim=32, num_heads=8, mlp_dim=64)
    rng = np.random.RandomState(6)
    cal = [jnp.asarray(rng.rand(4, 6, 75, 216), jnp.float32)
           for _ in range(2)]
    variables = model.init({"params": jax.random.PRNGKey(0)}, cal[0],
                           train=False)

    policy, report = auto_hybrid_int8(model, variables, cal, gate=-1.0)
    assert not policy["activation_scales"] and policy["exclude"]
    f32 = np.asarray(jax.jit(
        lambda v, xi: model.apply(v, xi, train=False))(variables, cal[0]))
    got = np.asarray(jax.jit(quantized_apply_fn(
        model, **policy))(variables, cal[0]))
    np.testing.assert_array_equal(got, f32)
    assert report["worst"] == 0.0 and report["pred_max"] == 0.0

    policy2, report2 = auto_hybrid_int8(model, variables, cal, gate=10.0)
    assert report2["passed"] and not policy2["exclude"]
    assert policy2["activation_scales"]


@pytest.mark.slow
def test_predict_framewise_int8_matches_manual_composition():
    """The one-call gated serving mode (per-recording, per-tensor
    calibration + windowed int8 protocol) equals the hand-rolled
    calibrate→quantized_apply→predict_framewise sequence: by default the
    calibration span (the first full protocol batches) is served from
    the calibration pass's exact f32 forward and only the remaining
    frames run int8; ``reuse_cal_predictions=False`` recovers the
    all-int8 composition."""
    from multipitch_architectures_tpu.data.windows import gather_windows
    from multipitch_architectures_tpu.eval import (
        calibrate_activation_scales, predict_framewise,
        predict_framewise_int8, quantized_apply_fn)
    from multipitch_architectures_tpu.models import SimpleUNetDoubleSelfAttn

    model = SimpleUNetDoubleSelfAttn(
        n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
        embed_dim=32, num_heads=8, mlp_dim=64)
    rng = np.random.RandomState(7)
    inputs = rng.rand(6, 60, 216).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 6, 75, 216)), train=False)

    got = predict_framewise_int8(model, variables, inputs, batch_size=25,
                                 cal_batches=2)
    got_all_int8 = predict_framewise_int8(model, variables, inputs,
                                          batch_size=25, cal_batches=2,
                                          reuse_cal_predictions=False)

    x = jnp.log1p(10.0 * jnp.asarray(inputs))
    xp = jnp.pad(x, ((0, 0), (37, 38), (0, 0)))
    cal = [gather_windows(
        xp, jnp.asarray(np.minimum(37 + 25 * b + np.arange(25),
                                   37 + 60 - 1)), 75) for b in range(2)]
    scales = calibrate_activation_scales(model, variables, cal)
    q_all = predict_framewise(
        quantized_apply_fn(model, activation_scales=scales), variables,
        inputs, batch_size=25)
    f32_all = predict_framewise(
        lambda v, xi: model.apply(v, xi, train=False), variables, inputs,
        batch_size=25)
    # cal span (2 full batches of 25) = exact f32 (tight tolerance: both
    # sides are pure f32 programs); remainder = int8. Int8 outputs are
    # only comparable ACROSS differently-compiled programs to bin-flip
    # noise: ulp-level fusion differences in the upstream f32 ops flip
    # round(x/s) quantization bins, measured ~1e-3 on this model (both
    # jitted variants sit ~1e-3 from the eager ground truth) — so int8
    # cross-program assertions use a 5e-3 bound, which still catches a
    # wrong or unread scale (~1e-2+).
    np.testing.assert_allclose(got[:50], f32_all[:50], atol=1e-6, rtol=0)
    np.testing.assert_allclose(got[50:], q_all[50:], atol=5e-3, rtol=0)
    np.testing.assert_allclose(got_all_int8, q_all, atol=5e-3, rtol=0)
    # and the f32 reuse really is the f32 path, not int8: on the cal
    # span the two compositions must differ by genuine quantization
    # noise (unless int8 were a perfect roundtrip, which it is not here)
    assert np.abs(got[:50] - q_all[:50]).max() > 1e-6


def test_gate_verify_windows_cover_the_whole_protocol():
    """The int8 drift gate must verify on the protocol's own batching of
    the ENTIRE recording — every frame exactly once, natural-size tail.
    Spread-window verification has a measured blind spot: on the trained
    exp180e checkpoint 6-of-12 spread windows passed the proxy at 8.9e-4
    while the full-span drift was 1.83e-3
    (perf/results_r5_fullsize_trained_gate.txt)."""
    from multipitch_architectures_tpu.eval.inference import _pad_inputs
    from multipitch_architectures_tpu.eval.quant import \
        _gate_verify_windows

    t, context, bs = 130, 75, 50
    half = context // 2
    x = np.random.RandomState(0).rand(6, t, 216).astype(np.float32)
    xp = _pad_inputs(jnp.asarray(x), context)
    ws = _gate_verify_windows(xp, t, bs, context)
    # protocol batching: full groups + natural-size tail
    assert [int(w.shape[0]) for w in ws] == [50, 50, 30]
    # concatenated window centers are frames 0..t-1, each exactly once
    centers = np.concatenate([np.asarray(w)[:, :, half, :] for w in ws])
    np.testing.assert_array_equal(centers, x.transpose(1, 0, 2))
    # multiple-of-batch recordings get no ghost tail
    assert [int(w.shape[0])
            for w in _gate_verify_windows(xp, 100, bs, context)] == [50, 50]


@pytest.mark.slow            # ~4 min: full gated-serve integration
def test_predict_framewise_int8_gate_path():
    """The self-gating serve (``gate=``): the verify set is the FULL
    protocol span (built by ``_gate_verify_windows`` — see the blind
    spot it closes in that helper's docstring), a generous gate passes
    without demotion, and the gated output still composes the f32
    calibration span with int8 downstream. Uses the basic CNN — its
    15x15 kernels make int8 genuinely engage while compiling in seconds
    (the tiny attention U-Net takes minutes per quantized graph on
    XLA:CPU)."""
    from multipitch_architectures_tpu.eval import (predict_framewise,
                                                   predict_framewise_int8)

    model = BasicCnnSegmSigmoid(n_chan_layers=(8, 8, 4, 2), n_bins_out=72)
    rng = np.random.RandomState(11)
    inputs = rng.rand(6, 60, 216).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 6, 75, 216)), train=False)

    f32 = predict_framewise(
        lambda v, xi: model.apply(v, xi, train=False), variables, inputs,
        batch_size=25)
    got = predict_framewise_int8(model, variables, inputs, batch_size=25,
                                 cal_batches=2, gate=10.0)
    assert got.shape == f32.shape
    # calibration span is served from the exact f32 calibration pass;
    # the int8 remainder stays close but not bit-equal
    np.testing.assert_allclose(got[:50], f32[:50], atol=1e-6, rtol=0)
    assert float(np.abs(got[50:] - f32[50:]).max()) < 0.2


def test_predict_framewise_int8_short_recording_all_f32():
    """A recording no longer than the calibration span is served
    entirely from the exact f32 calibration pass."""
    from multipitch_architectures_tpu.eval import (predict_framewise,
                                                   predict_framewise_int8)
    from multipitch_architectures_tpu.models import SimpleUNetDoubleSelfAttn

    model = SimpleUNetDoubleSelfAttn(
        n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
        embed_dim=32, num_heads=8, mlp_dim=64)
    rng = np.random.RandomState(8)
    inputs = rng.rand(6, 25, 216).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 6, 75, 216)), train=False)
    got = predict_framewise_int8(model, variables, inputs, batch_size=25,
                                 cal_batches=2)
    f32 = predict_framewise(
        lambda v, xi: model.apply(v, xi, train=False), variables, inputs,
        batch_size=25)
    np.testing.assert_allclose(got, f32, atol=1e-6, rtol=0)


@pytest.mark.slow
def test_predict_framewise_int8_compile_once_across_recordings():
    """Per-recording calibration must NOT recompile the serving forward:
    scales travel as traced arguments (quantized_serving_fn), so a
    second recording with new scale values hits every jit cache."""
    from multipitch_architectures_tpu.eval import predict_framewise_int8
    from multipitch_architectures_tpu.eval.inference import _window_forward
    from multipitch_architectures_tpu.models import SimpleUNetDoubleSelfAttn

    model = SimpleUNetDoubleSelfAttn(
        n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
        embed_dim=32, num_heads=8, mlp_dim=64)
    rng = np.random.RandomState(9)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 6, 75, 216)), train=False)
    rec1 = rng.rand(6, 60, 216).astype(np.float32)
    rec2 = (2.5 * rng.rand(6, 60, 216)).astype(np.float32)  # new scales

    predict_framewise_int8(model, variables, rec1, batch_size=25,
                           cal_batches=1)
    before = _window_forward._cache_size()
    out2 = predict_framewise_int8(model, variables, rec2, batch_size=25,
                                  cal_batches=1)
    assert _window_forward._cache_size() == before, \
        "second recording recompiled the int8 serving forward"
    assert out2.shape == (60, 72)


def test_quantized_serving_fn_matches_baked_scales():
    """Scales passed inside the variables pytree (traced) produce the
    same outputs as the closure-baked quantized_apply_fn."""
    from multipitch_architectures_tpu.eval import (
        SCALES_COLLECTION, calibrate_activation_scales, quantized_apply_fn,
        quantized_serving_fn)
    from multipitch_architectures_tpu.models import SimpleUNetDoubleSelfAttn

    model = SimpleUNetDoubleSelfAttn(
        n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
        embed_dim=32, num_heads=8, mlp_dim=64)
    rng = np.random.RandomState(10)
    x = jnp.asarray(rng.rand(4, 6, 75, 216), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                           train=False)
    scales = calibrate_activation_scales(model, variables, [x])
    assert scales

    baked_fn = quantized_apply_fn(model, activation_scales=scales)
    baked = np.asarray(jax.jit(baked_fn)(variables, x))
    fn = quantized_serving_fn(model)
    assert fn is quantized_serving_fn(model)          # cached per policy
    vq = dict(variables)
    vq[SCALES_COLLECTION] = {k: jnp.asarray(v, jnp.float32)
                             for k, v in scales.items()}
    served = np.asarray(jax.jit(fn)(vq, x))
    # un-jitted, the two paths are BIT-identical (same ops, same scale
    # values); under jit they are the same computation in two different
    # programs, which for the int8 path means bin-flip-level noise
    # (~1e-3 measured — ulp fusion differences flip round(x/s) bins).
    eager_baked = np.asarray(baked_fn(variables, x))
    np.testing.assert_array_equal(np.asarray(fn(vq, x)), eager_baked)
    np.testing.assert_allclose(served, baked, atol=5e-3, rtol=0)
    # the traced scales are genuinely read: `served` and this distorted
    # call share ONE compiled program (same jitted fn, same shapes), so
    # any structured difference is purely the scale values' effect — if
    # the scales were ignored the diff would be exactly zero
    vq_bad = dict(variables)
    vq_bad[SCALES_COLLECTION] = {k: jnp.asarray(v * 8.0, jnp.float32)
                                 for k, v in scales.items()}
    distorted = np.asarray(jax.jit(fn)(vq_bad, x))
    assert np.abs(distorted - served).max() > 1e-4


@pytest.mark.slow
def test_in_graph_calibrated_int8_pipeline():
    """The bench's single-dispatch int8 serving executable (calibration
    probe + traced scales + scanned int8 batches INSIDE one jit —
    bench.py int8_serve) must run and agree with the library's
    per-recording serve to cross-program bin-flip noise. Guards the
    bench headline: this code path otherwise first executes on the real
    chip at round end."""
    import flax.linen as nn

    from multipitch_architectures_tpu.data.windows import gather_windows
    from multipitch_architectures_tpu.eval import (make_int8_interceptor,
                                                   predict_framewise_int8)
    from multipitch_architectures_tpu.eval.quant import _probe_for
    from multipitch_architectures_tpu.models import SimpleUNetDoubleSelfAttn

    group, batch = 10, 20
    model = SimpleUNetDoubleSelfAttn(
        n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
        embed_dim=32, num_heads=8, mlp_dim=64,
        attn_mode=f"cross_batch:{group}")
    rng = np.random.RandomState(12)
    inputs = rng.rand(6, 75, 216).astype(np.float32)   # 75 frames
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 6, 75, 216)), train=False)

    half = 37
    t = inputs.shape[1]
    n_cal = 2 * group                                  # 2 cal groups = 20
    cal_centers = jnp.asarray(half + np.arange(n_cal))
    n_rest_full = ((t - n_cal) // batch) * batch       # 40
    rest_mat = jnp.asarray(
        (half + n_cal + np.arange(n_rest_full)).reshape(-1, batch))
    rest_tails = []                      # full groups then natural size,
    start = n_cal + n_rest_full          # like bench.py's tail chunks
    while start < t:
        n = min(group, t - start)
        rest_tails.append(jnp.asarray(half + start + np.arange(n)))
        start += n
    probe = _probe_for(model, 4096, None, False, True)

    @jax.jit
    def int8_serve(variables, x):
        xp = jnp.pad(jnp.log1p(10.0 * x), ((0, 0), (half, half + 1),
                                           (0, 0)))
        (y_cal, _), captured = probe.jit(
            variables, gather_windows(xp, cal_centers, 75))
        scales = {k: jnp.maximum(v, 1e-12) / 127.0
                  for k, v in zip(list(probe.keys), captured)}
        interceptor = make_int8_interceptor(4096, scales)

        def apply_q(v, xw):
            with nn.intercept_methods(interceptor):
                return model.apply(v, xw, train=False)

        def body(_, centers):
            y = apply_q(variables, gather_windows(xp, centers, 75))
            return None, y.reshape(y.shape[0], -1)

        _, ys = jax.lax.scan(body, None, rest_mat)
        parts = [y_cal, ys.reshape(-1, ys.shape[-1])]
        for c in rest_tails:
            y = apply_q(variables, gather_windows(xp, c, 75))
            parts.append(y.reshape(y.shape[0], -1))
        return jnp.concatenate(parts, axis=0)

    got = np.asarray(int8_serve(variables, jnp.asarray(inputs)))
    want = predict_framewise_int8(model, variables, inputs,
                                  batch_size=group, cal_batches=2,
                                  group=group)
    assert got.shape == want.shape == (75, 72)
    # cal span f32 in both; int8 span to cross-program bin-flip noise
    np.testing.assert_allclose(got[:n_cal], want[:n_cal], atol=1e-6,
                               rtol=0)
    np.testing.assert_allclose(got[n_cal:], want[n_cal:], atol=5e-3,
                               rtol=0)


def test_predict_framewise_start_frame():
    """start_frame returns exactly the tail rows of the full protocol
    (composition preserved when start_frame is a batch multiple)."""
    from multipitch_architectures_tpu.eval import predict_framewise
    from multipitch_architectures_tpu.models import SimpleUNetDoubleSelfAttn

    model = SimpleUNetDoubleSelfAttn(
        n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
        embed_dim=32, num_heads=8, mlp_dim=64)
    rng = np.random.RandomState(11)
    inputs = rng.rand(6, 60, 216).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 6, 75, 216)), train=False)
    apply_fn = lambda v, xi: model.apply(v, xi, train=False)
    full = predict_framewise(apply_fn, variables, inputs, batch_size=25)
    tail = predict_framewise(apply_fn, variables, inputs, batch_size=25,
                             start_frame=25)
    np.testing.assert_array_equal(tail, full[25:])
    with pytest.raises(ValueError):
        predict_framewise(apply_fn, variables, inputs, batch_size=25,
                          start_frame=60)


def test_predict_framewise_return_aux_polyphony():
    """return_aux surfaces the PUnet polyphony head per frame (the
    reference notebook 02 uses both outputs)."""
    from multipitch_architectures_tpu.models import (
        SimpleUNetPolyphonyClassifSoftmax)

    model = SimpleUNetPolyphonyClassifSoftmax(
        n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
        num_polyphony_steps=24)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 6, 75, 216)), train=False)
    inputs = np.random.RandomState(0).rand(6, 13, 216).astype(np.float32)
    apply_fn = lambda v, xw: model.apply(v, xw, train=False)

    pred, aux = predict_framewise(apply_fn, variables, inputs,
                                  batch_size=8, return_aux=True)
    assert pred.shape == (13, 72) and aux.shape == (13, 24)

    only = predict_framewise(apply_fn, variables, inputs, batch_size=8)
    np.testing.assert_array_equal(pred, only)


@pytest.mark.slow
def test_shared_inc_matches_windowed_protocol():
    """predict_framewise_shared (cross-window sharing of the ``inc``
    interior, eval/shared_inc.py) must be float-reassociation-close to
    the exact windowed protocol, including the natural-size tail and the
    grouped cross-batch composition (exp180d…py:427-443 batching)."""
    from multipitch_architectures_tpu.eval import predict_framewise_shared
    from multipitch_architectures_tpu.models import SimpleUNetDoubleSelfAttn

    kw = dict(n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
              embed_dim=32, num_heads=8, mlp_dim=64,
              pos_encoding="sinusoidal")
    model = SimpleUNetDoubleSelfAttn(**kw)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 6, 75, 216)), train=False)
    inputs = np.random.RandomState(7).rand(6, 133, 216).astype(np.float32)

    want = predict_framewise(
        lambda v, xw: model.apply(v, xw, train=False), variables, inputs,
        batch_size=50)
    got = predict_framewise_shared(model, variables, inputs, batch_size=50)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)

    # grouped cross-batch attention: tail 33 -> one full 25-group + 8
    grouped = SimpleUNetDoubleSelfAttn(**kw, attn_mode="cross_batch:25")
    want_g = predict_framewise(
        lambda v, xw: grouped.apply(v, xw, train=False), variables, inputs,
        batch_size=50, group=25)
    got_g = predict_framewise_shared(grouped, variables, inputs,
                                     batch_size=50, group=25)
    np.testing.assert_allclose(got_g, want_g, atol=2e-5)

    # the forward (and its compiled programs) is cached across serving
    # calls — a fresh instance per recording would recompile everything
    from multipitch_architectures_tpu.eval.shared_inc import _forward_for
    assert _forward_for(model, 75, 4096, None, False) \
        is _forward_for(SimpleUNetDoubleSelfAttn(**kw), 75, 4096, None,
                        False)


@pytest.mark.slow
def test_shared_inc_supports_residual_down_blocks():
    """`residual` shortcuts live in the down/up blocks, never in inc
    (unets._encode passes inc_residual separately), so shared-inc must
    accept residual models and stay protocol-close; alt_order DOES
    change inc and stays rejected."""
    from multipitch_architectures_tpu.eval import predict_framewise_shared
    from multipitch_architectures_tpu.models import SimpleUNetDoubleSelfAttn

    kw = dict(n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
              embed_dim=32, num_heads=8, mlp_dim=64, residual=True)
    model = SimpleUNetDoubleSelfAttn(**kw)
    variables = model.init({"params": jax.random.PRNGKey(2)},
                           jnp.zeros((1, 6, 75, 216)), train=False)
    inputs = np.random.RandomState(8).rand(6, 60, 216).astype(np.float32)
    want = predict_framewise(
        lambda v, xw: model.apply(v, xw, train=False), variables, inputs,
        batch_size=25)
    got = predict_framewise_shared(model, variables, inputs, batch_size=25)
    np.testing.assert_allclose(got, want, atol=2e-5)

    alt = SimpleUNetDoubleSelfAttn(
        n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
        embed_dim=32, num_heads=8, mlp_dim=64, alt_order=True)
    with pytest.raises(ValueError, match="alt_order"):
        predict_framewise_shared(alt, variables, inputs, batch_size=25)


@pytest.mark.slow
def test_shared_inc_polyphony_aux_and_int8():
    """shared-inc composes with the PUnet aux head and the int8 serving
    interceptor (downstream convs quantized, shared ``inc`` kept f32)."""
    from multipitch_architectures_tpu.eval import predict_framewise_shared
    from multipitch_architectures_tpu.models import (
        SimpleUNetDoubleSelfAttn, SimpleUNetDoubleSelfAttnPolyphony)

    pu = SimpleUNetDoubleSelfAttnPolyphony(
        n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
        embed_dim=32, num_heads=8, mlp_dim=64)
    variables = pu.init({"params": jax.random.PRNGKey(1)},
                        jnp.zeros((1, 6, 75, 216)), train=False)
    inputs = np.random.RandomState(8).rand(6, 23, 216).astype(np.float32)
    want, want_aux = predict_framewise(
        lambda v, xw: pu.apply(v, xw, train=False), variables, inputs,
        batch_size=16, return_aux=True)
    got, got_aux = predict_framewise_shared(pu, variables, inputs,
                                            batch_size=16, return_aux=True)
    np.testing.assert_allclose(got, want, atol=2e-5)
    np.testing.assert_allclose(got_aux, want_aux, atol=2e-5)

    sa = SimpleUNetDoubleSelfAttn(
        n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
        embed_dim=32, num_heads=8, mlp_dim=64)
    v2 = sa.init({"params": jax.random.PRNGKey(2)},
                 jnp.zeros((1, 6, 75, 216)), train=False)
    f32 = predict_framewise(
        lambda v, xw: sa.apply(v, xw, train=False), v2, inputs,
        batch_size=16)
    q = predict_framewise_shared(sa, v2, inputs, batch_size=16, int8=True)
    assert (q != f32).any()                       # int8 path actually taken
    assert np.abs(q - f32).max() < 5e-3


def test_shared_inc_rejects_unsupported_double_conv_branches():
    """Options that change the ``inc`` arithmetic the shared path
    reimplements must refuse, not silently drift: alt_order reorders
    inc's conv/BN/activation. ``residual`` shortcuts apply to down/up
    blocks only (unets._encode never passes it to inc) and are ACCEPTED
    — protocol-parity covered by
    test_shared_inc_supports_residual_down_blocks."""
    import pytest as _pytest

    from multipitch_architectures_tpu.eval import SharedIncForward
    from multipitch_architectures_tpu.models import SimpleUNetDoubleSelfAttn

    kw = dict(n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
              embed_dim=32, num_heads=8, mlp_dim=64)
    with _pytest.raises(ValueError, match="alt_order"):
        SharedIncForward(SimpleUNetDoubleSelfAttn(**kw, alt_order=True))
    SharedIncForward(SimpleUNetDoubleSelfAttn(**kw, residual=True))


@pytest.mark.slow
def test_predict_framewise_matches_committed_golden():
    """Whole-protocol output pin (VERDICT r3 task 9): committed
    predict_framewise outputs for a fixed tiny checkpoint + fixed
    synthetic HCQT (tests/goldens/predict_framewise_golden.npz,
    generated by tools/gen_whole_protocol_golden.py). Guards the whole
    windowed path — log compression, (37,38) pad, window gather, the
    reference drain order (full batches, full-group tail, natural-size
    remainder) and grouped block-diagonal attention — against silent
    numeric drift from future jax/XLA upgrades. The stored variables are
    EXACT (msgpack), so only protocol numerics are under test, not
    initializer numerics. Reference protocol: exp180d…py:427-443."""
    import dataclasses
    import os

    from flax import serialization

    from multipitch_architectures_tpu.models import SimpleUNetDoubleSelfAttn

    g = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                             "predict_framewise_golden.npz"))
    model = SimpleUNetDoubleSelfAttn(
        n_chan_layers=(8, 8, 4, 2), n_bins_out=72, scalefac=16,
        embed_dim=32, num_heads=8, mlp_dim=64, pos_encoding="sinusoidal")
    template = model.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 6, 75, 216), jnp.float32),
                          train=False)
    variables = serialization.from_bytes(
        template, g["variables_msgpack"].tobytes())
    variables = jax.tree.map(jnp.asarray, variables)
    inputs = g["inputs"]
    batch, group = int(g["batch"]), int(g["group"])

    pred_plain = predict_framewise(
        lambda v, xw: model.apply(v, xw, train=False), variables, inputs,
        batch_size=group)
    np.testing.assert_allclose(pred_plain, g["pred_plain"], atol=2e-5,
                               rtol=1e-5)

    grouped = dataclasses.replace(model, attn_mode=f"cross_batch:{group}")
    pred_grouped = predict_framewise(
        lambda v, xw: grouped.apply(v, xw, train=False), variables,
        inputs, batch_size=batch, group=group)
    np.testing.assert_allclose(pred_grouped, g["pred_grouped"], atol=2e-5,
                               rtol=1e-5)
