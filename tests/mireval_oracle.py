"""Independent test oracle for mir_eval.multipitch.evaluate.

mir_eval is not installed in this image, so this module re-derives the
published algorithm (mir_eval 0.7 ``multipitch.py``; Bay et al. 2009
measures) along mir_eval's OWN computation path — frequencies in Hz,
conversion to float MIDI, 50-cent-window maximum bipartite matching,
chroma wrapping via min(d, 12-d) — which is deliberately DIFFERENT from
the production engine's direct bin counting
(multipitch_architectures_tpu/eval/mireval.py). Agreement between the
two paths on bin-grid inputs (the only setting the reference uses,
eval_metrics.py:176-187) is what the fuzz tests assert.

Production code must never import this module.
"""

import numpy as np
from scipy.optimize import linear_sum_assignment


def freqs_to_midi(freqs):
    """mir_eval.multipitch.frequencies_to_midi (ref_frequency=440)."""
    freqs = np.asarray(freqs, dtype=np.float64)
    return 69.0 + 12.0 * np.log2(freqs / 440.0) if freqs.size else freqs


def _match_count(ref, est, window, chroma):
    """Size of the maximum bipartite matching between ref and est pitch
    lists under |ref - est| <= window (semitones); chroma distances wrap
    (mir_eval.util.match_events / multipitch.compute_num_true_positives).

    Maximum-cardinality matching computed via the assignment problem on a
    0/1 cost matrix (a maximum matching minimizes the number of unmatched
    pairs), equivalent to mir_eval's Hopcroft-Karp result size."""
    if len(ref) == 0 or len(est) == 0:
        return 0
    d = np.abs(np.subtract.outer(ref, est))
    if chroma:
        d = np.minimum(d, 12.0 - d)
    hit = d <= window
    if not hit.any():
        return 0
    # pad to square with non-hit cost so linear_sum_assignment returns a
    # max-cardinality matching of the hit graph
    n = max(len(ref), len(est))
    cost = np.ones((n, n))
    cost[: len(ref), : len(est)] = np.where(hit, 0.0, 1.0)
    rows, cols = linear_sum_assignment(cost)
    return int(
        sum(1 for r, c in zip(rows, cols)
            if r < len(ref) and c < len(est) and hit[r, c]))


def evaluate(ref_time, ref_freqs, est_time, est_freqs, window=0.5):
    """mir_eval.multipitch.evaluate for aligned time grids.

    ref_freqs/est_freqs: per-frame arrays of frequencies in Hz.
    Returns the 14-key measures dict with mir_eval's names.
    """
    assert len(ref_time) == len(est_time) == len(ref_freqs) == len(est_freqs)
    ref_midi = [freqs_to_midi(f) for f in ref_freqs]
    est_midi = [freqs_to_midi(f) for f in est_freqs]

    out = {}
    for chroma, prefix in ((False, ""), (True, "Chroma ")):
        if chroma:
            rm = [np.mod(m, 12) for m in ref_midi]
            em = [np.mod(m, 12) for m in est_midi]
        else:
            rm, em = ref_midi, est_midi
        n_ref = np.array([len(m) for m in rm], dtype=np.float64)
        n_est = np.array([len(m) for m in em], dtype=np.float64)
        tp = np.array([_match_count(r, e, window, chroma)
                       for r, e in zip(rm, em)], dtype=np.float64)
        fp = n_est - tp
        fn = n_ref - tp
        precision = tp.sum() / n_est.sum() if n_est.sum() > 0 else 0.0
        recall = tp.sum() / n_ref.sum() if n_ref.sum() > 0 else 0.0
        denom = tp.sum() + fp.sum() + fn.sum()
        accuracy = tp.sum() / denom if denom > 0 else 0.0
        ref_total = max(n_ref.sum(), 1.0)
        e_sub = (np.minimum(n_ref, n_est) - tp).sum() / ref_total
        e_miss = np.maximum(0.0, n_ref - n_est).sum() / ref_total
        e_fa = np.maximum(0.0, n_est - n_ref).sum() / ref_total
        e_tot = (np.maximum(n_ref, n_est) - tp).sum() / ref_total
        out[prefix + "Precision"] = float(precision)
        out[prefix + "Recall"] = float(recall)
        out[prefix + "Accuracy"] = float(accuracy)
        out[prefix + "Substitution Error"] = float(e_sub)
        out[prefix + "Miss Error"] = float(e_miss)
        out[prefix + "False Alarm Error"] = float(e_fa)
        out[prefix + "Total Error"] = float(e_tot)
    return out
