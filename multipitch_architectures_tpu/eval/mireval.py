"""mir_eval-compatible multi-pitch evaluation.

Re-implements ``mir_eval.multipitch.evaluate`` semantics for the setting
the reference uses it in (eval_metrics.py:158-189): both reference and
estimate frequency lists are generated from the SAME integer-MIDI bin
grid, so mir_eval's 50-cent matching reduces to exact bin equality (bins
are ≥100 cents apart) and chroma matching to pitch-class multiset
intersection. All 14 measures (plain + chroma) are produced with
mir_eval's exact names and normalizations (Poliner-Ellis error scores
normalized by total reference count).

Like the reference, the frame rate defaults to the HCQT rate
43.066406250 Hz (hard-coded there, eval_metrics.py:174 — here a
parameter).
"""

import numpy as np


def midi_to_hz(midi):
    """440 * 2^((m-69)/12) (librosa.midi_to_hz equivalent)."""
    return 440.0 * 2.0 ** ((np.asarray(midi, dtype=np.float64) - 69) / 12.0)


def _counts(targ_bin, est_bin):
    """Per-frame TP / substitution / miss / fa counts for bin-grid rolls.

    targ_bin, est_bin: binary (n_frames, n_bins).
    Returns dict of per-frame count vectors.
    """
    n_ref = targ_bin.sum(axis=1)
    n_est = est_bin.sum(axis=1)
    tp = np.logical_and(targ_bin, est_bin).sum(axis=1)
    e_sub = np.minimum(n_ref, n_est) - tp
    e_miss = np.maximum(0, n_ref - n_est)
    e_fa = np.maximum(0, n_est - n_ref)
    return dict(n_ref=n_ref, n_est=n_est, tp=tp, e_sub=e_sub,
                e_miss=e_miss, e_fa=e_fa)


def _chroma_fold(binary_roll, min_pitch):
    """(n_frames, n_bins) → (n_frames, 12) per-pitch-class counts."""
    n_frames, n_bins = binary_roll.shape
    pcs = (min_pitch + np.arange(n_bins)) % 12
    out = np.zeros((n_frames, 12), dtype=np.int64)
    for pc in range(12):
        out[:, pc] = binary_roll[:, pcs == pc].sum(axis=1)
    return out


def _chroma_counts(targ_bin, est_bin, min_pitch):
    """Chroma variant: multiset intersection of pitch classes per frame."""
    tc = _chroma_fold(targ_bin, min_pitch)
    ec = _chroma_fold(est_bin, min_pitch)
    n_ref = tc.sum(axis=1)
    n_est = ec.sum(axis=1)
    tp = np.minimum(tc, ec).sum(axis=1)
    e_sub = np.minimum(n_ref, n_est) - tp
    e_miss = np.maximum(0, n_ref - n_est)
    e_fa = np.maximum(0, n_est - n_ref)
    return dict(n_ref=n_ref, n_est=n_est, tp=tp, e_sub=e_sub,
                e_miss=e_miss, e_fa=e_fa)


def _metrics_from_counts(c):
    ref_total = max(c["n_ref"].sum(), 1)
    est_total = c["n_est"].sum()
    tp_total = c["tp"].sum()
    fp_total = est_total - tp_total
    fn_total = c["n_ref"].sum() - tp_total
    precision = tp_total / est_total if est_total > 0 else 0.0
    recall = tp_total / c["n_ref"].sum() if c["n_ref"].sum() > 0 else 0.0
    denom = tp_total + fp_total + fn_total
    accuracy = tp_total / denom if denom > 0 else 0.0
    e_sub = c["e_sub"].sum() / ref_total
    e_miss = c["e_miss"].sum() / ref_total
    e_fa = c["e_fa"].sum() / ref_total
    e_tot = (np.maximum(c["n_ref"], c["n_est"]) - c["tp"]).sum() / ref_total
    return (float(precision), float(recall), float(accuracy),
            float(e_sub), float(e_miss), float(e_fa), float(e_tot))


def calculate_mpe_measures_mireval(targets, predictions, threshold=0.5,
                                   min_pitch=24, fs_hcqt=43.066406250):
    """The reference's mir_eval wrapper (eval_metrics.py:158-189): binarize
    predictions, interpret bin k as MIDI pitch ``min_pitch + k``, return
    the 14 mir_eval.multipitch measures with mir_eval's key names."""
    targ = np.asarray(targets) > 0
    est = np.asarray(predictions) >= threshold

    p, r, a, es, em, ef, et = _metrics_from_counts(_counts(targ, est))
    cp, cr, ca, ces, cem, cef, cet = _metrics_from_counts(
        _chroma_counts(targ, est, min_pitch))
    return {
        "Precision": p,
        "Recall": r,
        "Accuracy": a,
        "Substitution Error": es,
        "Miss Error": em,
        "False Alarm Error": ef,
        "Total Error": et,
        "Chroma Precision": cp,
        "Chroma Recall": cr,
        "Chroma Accuracy": ca,
        "Chroma Substitution Error": ces,
        "Chroma Miss Error": cem,
        "Chroma False Alarm Error": cef,
        "Chroma Total Error": cet,
    }
