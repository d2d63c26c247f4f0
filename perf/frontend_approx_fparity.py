"""Does frontend CQT approximation error move the F-gate? (round 4)

The one unprovable parity clause without librosa in the image (ROADMAP
known-gap #2) is whether OUR multirate CQT differs from librosa 0.8's
multirate CQT enough to matter. Both implementations approximate the
same mathematical transform (direct constant-Q correlation), each to
~1e-3 relative error (ours: tests/test_dsp.py vs cqt_direct_numpy;
librosa's recursive-downsampling CQT makes the same class of multirate
approximation). This experiment measures the END-TO-END consequence of
exactly that class of error:

  1. synthesize polyphonic audio with known note events;
  2. train a SAUnet on PRODUCTION features (compute_efficient_hcqt,
     fast multirate CQT);
  3. evaluate the trained checkpoint on the test recording's features
     computed BOTH ways — production vs an exact direct-DFT HCQT oracle
     (cqt_direct_numpy per base harmonic, identical assembly to
     dsp/hcqt.py::efficient_hcqt_device);
  4. report the worst-of-25-measures drift between the two runs.

By the triangle inequality |prod - librosa| <= |prod - oracle| +
|librosa - oracle|, and librosa's gap to the oracle is the same
multirate-approximation class as ours — so the measured end-to-end
insensitivity to an error of this class (in fact to the FULL prod-vs-
oracle gap, which is 1.45e-2 rel-to-peak, far larger than any plausible
prod-vs-librosa residual) is the strongest librosa-parity evidence
obtainable in this image. Reference frontend being matched:
/root/reference/libdl/data_preprocessing/hcqt.py:89-164 (librosa 0.8).

MEASURED (results_r4_frontend_approx.txt): trained F 0.9128 vs 0.9132,
prediction delta mean 3.8e-5, worst-of-25-measures drift 9.6e-4
(False Alarm Error) — PASS vs 1e-3, marginal; every other measure well
under.

Round 5 adds the EXACT-frontend row (dsp ``exact=True``: per-octave
full-rate kernels, no decimation — perf/frontend_precision_study.py
showed the multirate gap is kernel-reuse error no half-band upgrade can
fix): the same trained checkpoint evaluated on exact-frontend features
vs the oracle, with a 5e-4 headroom target for gate-marginal
audio-input serving (VERDICT r4 task 6).

Run on CPU: python perf/frontend_approx_fparity.py
Results: perf/results_r4_frontend_approx.txt (r4),
         perf/results_r5_frontend_approx.txt (r5, + exact row)
"""
import os
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multipitch_architectures_tpu.data import (AugmentConfig, FileSpec,
                                               TrainPipeline)
from multipitch_architectures_tpu.dsp import (
    compute_annotation_array_nooverlap, compute_efficient_hcqt,
    cqt_direct_numpy)
from multipitch_architectures_tpu.dsp.hcqt import (_centered_fmin,
                                                   _harmonic_layout,
                                                   compute_hopsize_cqt)
from multipitch_architectures_tpu.eval import (calculate_eval_measures,
                                               calculate_mpe_measures_mireval,
                                               predict_framewise)
from multipitch_architectures_tpu.models import SimpleUNetDoubleSelfAttn
from multipitch_architectures_tpu.train import Trainer, TrainConfig

FS = 22050
MEAS = ["precision", "recall", "f_measure", "cosine_sim",
        "binary_crossentropy", "euclidean_distance", "binary_accuracy",
        "soft_accuracy", "accum_energy", "roc_auc_measure",
        "average_precision_score"]


def synth_audio(dur_s, seed, max_poly=3):
    """Polyphonic harmonic tones from random note events; returns
    (audio float32, events (start,end,midi))."""
    rng = np.random.RandomState(seed)
    n = int(dur_s * FS)
    t = np.arange(n) / FS
    audio = np.zeros(n, np.float64)
    events = []
    pos = 0.0
    while pos < dur_s - 0.3:
        dur = rng.uniform(0.25, 0.9)
        end = min(pos + dur, dur_s)
        for midi in rng.choice(np.arange(40, 80),
                               rng.randint(1, max_poly + 1), replace=False):
            f0 = 440.0 * 2.0 ** ((midi - 69) / 12.0)
            i0, i1 = int(pos * FS), int(end * FS)
            seg_t = t[i0:i1]
            tone = sum((1.0 / h) * np.sin(2 * np.pi * f0 * h * seg_t
                                          + rng.uniform(0, 2 * np.pi))
                       for h in range(1, 6))
            env = np.minimum(1.0, np.minimum(
                np.arange(i1 - i0), np.arange(i1 - i0)[::-1]) / (0.01 * FS))
            audio[i0:i1] += 0.2 * rng.uniform(0.5, 1.0) * env * tone
            events.append((pos, end, float(midi)))
        pos = end
    audio += 1e-4 * rng.randn(n)
    return audio.astype(np.float32), np.array(events)


def hcqt_direct_oracle(audio, fs_hcqt_target=50, bins_per_octave=36,
                       num_octaves=6, num_harmonics=5, num_subharmonics=1):
    """Exact direct-DFT HCQT: cqt_direct_numpy per base harmonic,
    assembled exactly like efficient_hcqt_device (octave-shifted slices;
    dsp/hcqt.py:111-134). Returns reference layout (n_bins, T, 6)."""
    num_octaves_eff = num_octaves + int(
        np.ceil(np.log2(num_subharmonics + 1) + np.log2(num_harmonics)))
    hop, _ = compute_hopsize_cqt(fs_hcqt_target, fs=FS,
                                 num_octaves=num_octaves_eff)
    fmin = _centered_fmin(32.70319566257483, bins_per_octave, True)
    n_frames = len(audio) // hop + 1
    n_bins = bins_per_octave * num_octaves
    harmonics, assignment = _harmonic_layout(num_harmonics,
                                             num_subharmonics)
    channels = [None] * len(harmonics)
    for base in sorted({b for b, _ in assignment}):
        max_shift = max(s for b, s in assignment if b == base)
        ext_bins = (num_octaves + max_shift) * bins_per_octave
        f_cqt = cqt_direct_numpy(audio, FS, hop, fmin * base, ext_bins,
                                 bins_per_octave)
        for idx, (b, shift) in enumerate(assignment):
            if b != base:
                continue
            lo = shift * bins_per_octave
            channels[idx] = f_cqt[lo:lo + n_bins, :n_frames]
    return np.stack(channels, axis=-1).astype(np.float32), FS / hop


def features_and_roll(dur_s, seed):
    audio, events = synth_audio(dur_s, seed)
    f, fs_hcqt, _ = compute_efficient_hcqt(
        audio, fs=FS, fs_hcqt_target=50, bins_per_octave=36,
        num_octaves=6, tuning=0.0)
    roll = compute_annotation_array_nooverlap(events, f.shape[1], fs_hcqt,
                                              annot_type="pitch")
    # model layout (6, T, F) + (T, 128) roll
    return (audio, np.ascontiguousarray(np.transpose(f, (2, 1, 0))),
            np.asarray(roll, np.float32).T)


def main():
    print("synthesizing corpus + production features...")
    train_files = []
    for s in range(3):
        _, x, roll = features_and_roll(25.0, seed=s)
        train_files.append(FileSpec(x, roll))
    test_audio, test_x, test_roll = features_and_roll(14.0, seed=99)
    targ = test_roll[:, 24:96]

    print("training SAUnet on production features...")
    aug = AugmentConfig(noisestd=1e-4, compression=10.0)
    pipeline = TrainPipeline(train_files, context=75, stride=5,
                             augment=aug, target_slice=(24, 96))
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

    print("computing the direct-DFT oracle HCQT of the test clip...")
    f_oracle, _ = hcqt_direct_oracle(test_audio)
    oracle_x = np.ascontiguousarray(np.transpose(f_oracle, (2, 1, 0)))
    feat_rel = np.abs(oracle_x - test_x).max() / test_x.max()
    print(f"feature gap production-vs-oracle: {feat_rel:.2e} rel-to-peak "
          f"(the multirate approximation; librosa 0.8 sits within the "
          f"same class)")

    def measures(pred):
        m = calculate_eval_measures(targ, pred, MEAS, threshold=0.4)
        m.update(calculate_mpe_measures_mireval(targ, pred, threshold=0.4,
                                                min_pitch=24))
        return m

    print("computing the exact-frontend HCQT (dsp exact=True, r5)...")
    f_exact, _, _ = compute_efficient_hcqt(
        test_audio, fs=FS, fs_hcqt_target=50, bins_per_octave=36,
        num_octaves=6, tuning=0.0, exact=True)
    exact_x = np.ascontiguousarray(np.transpose(f_exact, (2, 1, 0)))
    exact_rel = np.abs(oracle_x - exact_x).max() / test_x.max()
    print(f"feature gap exact-vs-oracle: {exact_rel:.2e} rel-to-peak")

    apply_fn = lambda v, xw: model.apply(v, xw, train=False)
    pred_prod = predict_framewise(apply_fn, variables, test_x,
                                  batch_size=50)
    pred_orac = predict_framewise(apply_fn, variables, oracle_x,
                                  batch_size=50)
    pred_exact = predict_framewise(apply_fn, variables, exact_x,
                                   batch_size=50)
    m_prod, m_orac = measures(pred_prod), measures(pred_orac)
    m_exact = measures(pred_exact)
    print(f"F (production features) = {m_prod['f_measure']:.4f}")
    print(f"F (oracle features)     = {m_orac['f_measure']:.4f}")
    print(f"F (exact frontend)      = {m_exact['f_measure']:.4f}")
    worst = max(abs(m_prod[k] - m_orac[k]) for k in m_prod)
    wk = max(m_prod, key=lambda k: abs(m_prod[k] - m_orac[k]))
    pd = np.abs(pred_prod - pred_orac)
    print(f"prediction delta (prod): max={pd.max():.5f} "
          f"mean={pd.mean():.6f}")
    print(f"worst-of-{len(m_prod)}-measures drift (production vs oracle)"
          f" = {worst:.5f} ({wk}) "
          f"{'PASS' if worst <= 1e-3 else 'FAIL'} vs 1e-3")
    worst_e = max(abs(m_exact[k] - m_orac[k]) for k in m_orac)
    wke = max(m_orac, key=lambda k: abs(m_exact[k] - m_orac[k]))
    pde = np.abs(pred_exact - pred_orac)
    print(f"prediction delta (exact): max={pde.max():.5f} "
          f"mean={pde.mean():.6f}")
    print(f"worst-of-{len(m_orac)}-measures drift (exact-frontend vs "
          f"oracle) = {worst_e:.5f} ({wke}) — headroom target 5e-4: "
          f"{'MET' if worst_e <= 5e-4 else 'NOT MET'}")


if __name__ == "__main__":
    main()
