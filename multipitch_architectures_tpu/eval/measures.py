"""Framewise evaluation measures.

Re-implements the reference's metric engine (libdl/metrics/eval_metrics.py)
plus the two load-bearing libfmp helpers it calls
(libfmp.c5.compute_eval_measures, libfmp.c3.normalize_feature_sequence) —
the reference vendors 9.5k LoC of libfmp for exactly these (SURVEY §2.7).

Semantic quirks preserved on purpose:
- binary_crossentropy uses log base 2 (eval_metrics.py:71);
- cosine_sim replaces near-zero frames with L2 unit vectors
  (threshold 1e-10, eval_metrics.py:65-67);
- precision/recall/f_measure are 0 (not NaN) when TP == 0.

Inputs are (n_frames, n_bins) arrays; numpy in/out (host aggregation);
ROC-AUC / average-precision delegate to sklearn exactly like the
reference (eval_metrics.py:92,110).
"""

import numpy as np

EPS = np.finfo(float).eps


def compute_eval_measures(i_ref, i_est):
    """P/R/F + TP/FP/FN over binary arrays
    (libfmp/c5/c5s2_chord_rec_template.py:238-261)."""
    assert i_ref.shape == i_est.shape
    tp = int(np.sum(np.logical_and(i_ref, i_est)))
    fp = int(np.sum(i_est > 0)) - tp
    fn = int(np.sum(i_ref > 0)) - tp
    p = r = f = 0.0
    if tp > 0:
        p = tp / (tp + fp)
        r = tp / (tp + fn)
        f = 2 * p * r / (p + r)
    return p, r, f, tp, fp, fn


def normalize_feature_sequence(x, norm="2", threshold=1e-4, v=None):
    """Column-wise normalization (libfmp/c3/c3s1_post_processing.py:31):
    columns with norm ≤ threshold are replaced by the unit vector."""
    assert norm == "2", "only the L2 variant is load-bearing"
    k, n = x.shape
    if v is None:
        v = np.ones(k) / np.sqrt(k)
    norms = np.sqrt(np.sum(x.astype(np.float64) ** 2, axis=0))
    safe = norms > threshold
    out = np.where(safe[None, :], x / np.where(safe, norms, 1.0)[None, :],
                   v[:, None])
    return out


def calculate_single_measure(targets, predictions, measure, threshold=0.5,
                             save_roc_plot=False, path_output="roc.pdf"):
    """One measure over (n_frames, n_bins) target/prediction arrays
    (reference eval_metrics.py:8-116; threshold 0.4 in experiments)."""
    targ = np.asarray(targets)
    pred = np.asarray(predictions)
    assert targ.shape == pred.shape, \
        "Error: Targets and predictions have different shape!"
    pred_thresh = pred >= threshold

    if measure in ("precision", "recall", "f_measure"):
        p, r, f, *_ = compute_eval_measures(targ, pred_thresh)
        return {"precision": p, "recall": r, "f_measure": f}[measure]

    if measure == "cosine_sim":
        t2 = normalize_feature_sequence(targ.T, threshold=1e-10)
        p2 = normalize_feature_sequence(pred.T, threshold=1e-10)
        return float(np.sum(t2 * p2) / t2.shape[1])

    if measure == "binary_crossentropy":
        return float(-np.mean(targ * np.log2(pred + EPS)
                              + (1 - targ) * np.log2(1 - pred + EPS)))

    if measure == "euclidean_distance":
        return float(np.mean(np.sqrt(np.sum((targ - pred) ** 2, axis=1))))

    if measure == "binary_accuracy":
        return float(np.mean(pred_thresh == targ))

    if measure == "soft_accuracy":
        return float(np.mean(targ * pred + (1 - targ) * (1 - pred)))

    if measure == "accum_energy":
        return float(np.mean(np.sum(targ * pred, axis=1)
                             / (np.sum(targ, axis=1) + EPS)))

    if measure == "roc_auc_measure":
        from sklearn import metrics as sk_metrics

        val = float(sk_metrics.roc_auc_score(targ.flatten(), pred.flatten()))
        if save_roc_plot:  # pragma: no cover - plotting side effect
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fpr, tpr, _ = sk_metrics.roc_curve(targ.flatten(),
                                               pred.flatten(), pos_label=1)
            plt.figure()
            plt.plot(fpr, tpr, label=f"ROC curve (area = {val:.4f})")
            plt.plot([0, 1], [0, 1], linestyle="--")
            plt.savefig(path_output)
        return val

    if measure == "average_precision_score":
        from sklearn import metrics as sk_metrics

        return float(sk_metrics.average_precision_score(targ.flatten(),
                                                        pred.flatten()))

    raise AssertionError(
        f"ERROR: Evaluation measure {measure} not implemented!")


def calculate_eval_measures(targets, predictions, measures, threshold=0.5,
                            save_roc_plot=False, path_output="roc.pdf"):
    """Dict of all requested measures (reference eval_metrics.py:120-155)."""
    return {m: calculate_single_measure(targets, predictions, m, threshold,
                                        save_roc_plot, path_output)
            for m in measures}
