#!/usr/bin/env python
"""One-command published-checkpoint parity gate (VERDICT r3 task 3).

The moment the stripped reference blobs (pretrained ``.pt`` files +
MusicNet wav/hcqt/pitch triples, ``/root/reference/.MISSING_LARGE_BLOBS``)
become available, this runs the BASELINE gate with nothing left to
write::

    python tools/parity_gate.py \
        --checkpoint RETRAIN3_exp180d_..._model.pt \
        --config exp180d_musicnet_unet_extremelylarge_doubleselfattn \
        --hcqt <file>_hcqt.npy --targets <file>_pitch.npy [--int8]

It ports the torch checkpoint (models/port.py), evaluates the SAME
weights through BOTH protocols — the torch reference imported from
/root/reference (log compression, (37,38) pad, stride-1 windows through
a batch-50 loader: exp180d…py:393-459) and this framework's
``predict_framewise`` — and prints the full 25-measure drift table
(11 eval measures, eval_metrics.py + 14 mir_eval measures) with
PASS/FAIL against the 1e-3 gate. ``--int8`` additionally runs the
export-time int8 accuracy gate (eval.int8_drift_report) on the same
real data. Exit code 0 = all gates pass.

Inputs:
  --config NAME          experiment registry entry (model class+kwargs), or
  --model NAME --model-args JSON   explicit reference class name + kwargs,
                         or NEITHER: the config is auto-resolved from the
                         checkpoint filename (the published checkpoints are
                         named after their experiment with an extra
                         ``aligned`` token, e.g.
                         ``exp214c_bigmix_aligned_cnn_deepresnetwide.pt`` →
                         registry ``exp214c_bigmix_cnn_deepresnetwide``) —
                         so the real-data gate is literally
                         ``parity_gate.py --checkpoint <blob.pt> --hcqt …``
                         the moment the .MISSING_LARGE_BLOBS files appear
  --hcqt F.npy           precomputed HCQT, reference layout (216, T, 6), or
  --audio F.wav          raw audio (22.05 kHz; HCQT computed on device)
  --targets F.npy        pitch roll, (T, 72) or reference (72, T) layout
                         (optional: without targets only prediction drift
                         and measure-vs-own-threshold tables are shown)
  --frames N             evaluate only the first N frames (bound runtime)

Tested end-to-end with a random state_dict + synthetic audio in
tests/test_parity_gate.py.
"""

import argparse
import json
import os
import sys
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reference_oracle import build_reference_model  # noqa: E402

EVAL_MEASURES = [
    "precision", "recall", "f_measure", "cosine_sim",
    "binary_crossentropy", "euclidean_distance", "binary_accuracy",
    "soft_accuracy", "accum_energy", "roc_auc_measure",
    "average_precision_score",
]


def resolve_config_from_checkpoint(path, registry_names=None):
    """Map a published-checkpoint filename to its experiment registry
    entry (VERDICT r4 task 8 — the blob-drop one-liner).

    The three stripped checkpoints (/root/reference/.MISSING_LARGE_BLOBS)
    are named after their experiment script with an extra ``aligned``
    token and optional ``_model`` suffix, e.g.
    ``RETRAIN4_exp195f_musicnet_aligned_unet_…_softmax_rerun1.pt`` →
    registry ``RETRAIN4_exp195f_musicnet_unet_…_softmax_rerun1``.

    Resolution: strip ``.pt``/``_model``, try the exact name, then the
    name with ``aligned`` tokens removed, then the unique registry entry
    whose underscore-token sequence is a subsequence of the filename's
    (same leading exp token). Raises ValueError with candidates when
    ambiguous or unknown."""
    if registry_names is None:
        from multipitch_architectures_tpu.experiments import (
            available_experiments)

        registry_names = available_experiments()
    base = os.path.basename(path)
    for suffix in (".pt", ".pth"):
        if base.endswith(suffix):
            base = base[: -len(suffix)]
    if base.endswith("_model"):
        base = base[: -len("_model")]
    if base in registry_names:
        return base
    toks = [t for t in base.split("_") if t != "aligned"]
    cleaned = "_".join(toks)
    if cleaned in registry_names:
        return cleaned

    def _subseq(needle, hay):
        it = iter(hay)
        return all(t in it for t in needle)

    exp_tok = next((t for t in toks if t.startswith("exp")), None)
    cands = [n for n in registry_names
             if exp_tok and exp_tok in n.split("_")
             and _subseq(n.split("_"), toks)]
    if len(cands) == 1:
        return cands[0]
    raise ValueError(
        f"cannot resolve a registry config from checkpoint name {base!r}"
        + (f"; candidates: {sorted(cands)}" if cands else
           " (no matching experiment; pass --config/--model explicitly)"))


def _load_state_dict(path):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("state_dict", "model_state_dict"):
            if key in obj and isinstance(obj[key], dict):
                return obj[key]
        return obj
    # a pickled whole model
    return obj.state_dict()


def _port_state_dict(model_name, sd):
    from multipitch_architectures_tpu.models import port

    if model_name.startswith("basic_cnn_segm_blank"):
        return port.port_basic_cnn_segm_blank(sd)
    if model_name.startswith("basic_cnn_segm"):
        return port.port_basic_cnn_segm(sd)
    if model_name.startswith("basic_cnn"):
        return port.port_basic_cnn(sd)
    if model_name.startswith("deep_cnn"):
        n_prefilt = 1 + len({k.split(".")[1] for k in sd
                             if k.startswith("prefilt_list.")})
        return port.port_deep_cnn_segm_sigmoid(sd, n_prefilt)
    if model_name.startswith("freq_u_net"):
        return port.port_freq_u_net_selfattn(
            sd, double="doubleselfattn" in model_name)
    return port.port_unet_auto(sd)


def _torch_protocol_predictions(tm, inputs, batch=50):
    """The reference test protocol in torch (exp180d…py:417-443)."""
    import torch

    half = 37
    t_frames = inputs.shape[1]
    xp = np.pad(np.log1p(10.0 * inputs), ((0, 0), (half, half + 1), (0, 0)))
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


def _load_inputs(args):
    if args.hcqt:
        f = np.load(args.hcqt)
        if f.ndim != 3:
            raise ValueError(f"HCQT must be 3-D, got {f.shape}")
        if f.shape[0] != 6 and f.shape[2] == 6:      # reference (216,T,6)
            f = np.transpose(f, (2, 1, 0))
        return np.ascontiguousarray(f.astype(np.float32))
    from multipitch_architectures_tpu.dsp import compute_efficient_hcqt
    from multipitch_architectures_tpu.io.audio import load_audio

    audio = (np.load(args.audio) if args.audio.endswith(".npy")
             else load_audio(args.audio, 22050))
    f, _, _ = compute_efficient_hcqt(np.asarray(audio, np.float32),
                                     fs=22050, fs_hcqt_target=50,
                                     bins_per_octave=36, num_octaves=6,
                                     exact=getattr(args, "exact_frontend",
                                                   False))
    return np.transpose(f, (2, 1, 0))


def _load_targets(path, t_frames, full_frames=None):
    """Load a (T, bins) target roll; ``full_frames`` is the recording's
    UNTRUNCATED frame count — layout detection must match against it,
    not the --frames-truncated ``t_frames`` (a (72, T) reference-layout
    file would otherwise never be transposed when --frames < T)."""
    full = full_frames or t_frames
    tg = np.load(path)
    if tg.ndim != 2:
        raise ValueError(f"targets must be 2-D, got {tg.shape}")
    if tg.shape[0] != full and tg.shape[1] == full:
        tg = tg.T                                    # reference (bins, T)
    elif tg.shape[0] in (72, 128) and tg.shape[1] not in (72, 128):
        tg = tg.T                    # bins-first heuristic (count mismatch)
    if tg.shape[1] == 128:                           # full MIDI roll
        tg = tg[:, 24:96]                            # reference pitch range
    return tg[:t_frames].astype(np.float32)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--checkpoint", required=True,
                    help="torch .pt state_dict saved by the reference")
    ap.add_argument("--config", help="experiment registry name "
                                     "(model class + kwargs)")
    ap.add_argument("--model", help="reference model class name")
    ap.add_argument("--model-args", default="{}", help="JSON kwargs")
    ap.add_argument("--hcqt", help="precomputed HCQT .npy (216, T, 6)")
    ap.add_argument("--audio", help="audio .wav/.npy (22.05 kHz)")
    ap.add_argument("--exact-frontend", action="store_true",
                    help="with --audio: per-octave full-rate CQT "
                    "kernels (no multirate decimation) — removes the "
                    "~1e-3-class frontend approximation when the gate "
                    "margin is tight (perf/frontend_precision_study.py)")
    ap.add_argument("--targets", help="pitch roll .npy (T,72) or (72,T)")
    ap.add_argument("--frames", type=int, default=0,
                    help="evaluate only the first N frames")
    ap.add_argument("--gate", type=float, default=1e-3)
    ap.add_argument("--batch-size", type=int, default=50)
    ap.add_argument("--int8", action="store_true",
                    help="also run the export-time int8 drift gate on "
                         "this data (eval.int8_drift_report)")
    ap.add_argument("--cpu", action="store_true",
                    help="pin JAX to CPU (cleanest torch-vs-ours numeric "
                         "comparison; default = the session's device, "
                         "which measures the SERVING backend's drift)")
    args = ap.parse_args(argv)
    if not (args.hcqt or args.audio):
        ap.error("one of --hcqt / --audio is required")
    if not (args.config or args.model):
        # blob-drop one-liner: published checkpoints are named after
        # their experiment — resolve the registry entry from the file
        args.config = resolve_config_from_checkpoint(args.checkpoint)
        print(f"config auto-resolved from checkpoint name: {args.config}")

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from multipitch_architectures_tpu.eval import (
        calculate_eval_measures, calculate_mpe_measures_mireval,
        predict_framewise)
    from multipitch_architectures_tpu.experiments import load_experiment
    from multipitch_architectures_tpu.experiments.configs import build_model

    if args.config:
        cfg = load_experiment(args.config)
        model_name, model_kwargs = cfg.model_class, cfg.model_kwargs
    else:
        model_name, model_kwargs = args.model, json.loads(args.model_args)

    sd = _load_state_dict(args.checkpoint)
    # reference_oracle filters model_kwargs by the constructor signature
    # (the reference scripts' model_params dicts carry keys the
    # constructors never receive, e.g. exp180e's n_ch_out —
    # exp180e…py:225-227; the registry keeps the dict faithfully)
    tm = build_reference_model(model_name, model_kwargs)
    tm.load_state_dict(sd)

    inputs = _load_inputs(args)
    full_frames = inputs.shape[1]
    if args.frames:
        inputs = inputs[:, :args.frames]
    t_frames = inputs.shape[1]
    print(f"model {model_name}, {t_frames} frames, gate {args.gate:g}")

    want = _torch_protocol_predictions(tm, inputs, batch=args.batch_size)

    model = build_model(model_name, model_kwargs)
    variables = jax.tree.map(jnp.asarray, _port_state_dict(model_name, sd))

    def apply_fn(v, xw):
        return model.apply(v, xw, train=False)

    got = predict_framewise(apply_fn, variables, inputs,
                            batch_size=args.batch_size)
    assert got.shape == want.shape, (got.shape, want.shape)
    pred_drift = float(np.abs(got - want).max())
    print(f"prediction drift: max={pred_drift:.2e} "
          f"mean={float(np.abs(got - want).mean()):.2e}")

    failed = []
    if args.targets:
        targets = _load_targets(args.targets, t_frames, full_frames)
        ours = calculate_eval_measures(targets, got, EVAL_MEASURES,
                                       threshold=0.4)
        theirs = calculate_eval_measures(targets, want, EVAL_MEASURES,
                                         threshold=0.4)
        ours.update(calculate_mpe_measures_mireval(targets, got,
                                                   threshold=0.4,
                                                   min_pitch=24))
        theirs.update(calculate_mpe_measures_mireval(targets, want,
                                                     threshold=0.4,
                                                     min_pitch=24))
        print(f"\n{'measure':28s} {'reference':>10s} {'ours':>10s} "
              f"{'drift':>10s}")
        for m in ours:
            drift = abs(ours[m] - theirs[m])
            ok = drift <= args.gate
            if not ok:
                failed.append(m)
            print(f"{m:28s} {theirs[m]:10.5f} {ours[m]:10.5f} "
                  f"{drift:10.2e} {'PASS' if ok else 'FAIL'}")
    else:
        pred_gate = max(args.gate, 2e-4 + 1e-2 * float(np.abs(want).max()))
        print("(no --targets: measure drift table skipped; gating on "
              f"raw prediction drift <= {pred_gate:.2e} — a looser "
              "heuristic than the measure gate, NOT a parity claim vs "
              f"{args.gate:g})")
        if pred_drift > pred_gate:
            failed.append("prediction_drift")

    if args.int8:
        from multipitch_architectures_tpu.eval import (
            calibrate_activation_scales)
        from multipitch_architectures_tpu.eval.quant import (
            int8_drift_report)

        half = 37
        xp = np.pad(np.log1p(10.0 * inputs),
                    ((0, 0), (half, half + 1), (0, 0)))
        # calibration on windows spread across the recording (range
        # estimation is position-insensitive); gate VERIFICATION on the
        # FULL protocol span — anything sparser has a measured blind
        # spot (leading-span: perf/results_r3_punet_hybrid.txt; even
        # spread windows: perf/results_r5_fullsize_trained_gate.txt,
        # proxy 8.9e-4 PASS vs whole-recording 1.83e-3 FAIL)
        starts = np.linspace(0, max(t_frames - args.batch_size, 0),
                             4).astype(int)
        cal = [np.stack([xp[:, i:i + 75, :]
                         for i in range(s, min(s + args.batch_size,
                                               t_frames))])
               for s in starts]
        verify = [np.stack([xp[:, i:i + 75, :]
                            for i in range(s, min(s + args.batch_size,
                                                  t_frames))])
                  for s in range(0, t_frames, args.batch_size)]
        scales = calibrate_activation_scales(model, variables, cal)
        report = int8_drift_report(model, variables, verify, scales,
                                   gate=args.gate)
        print(f"\nint8 gate: worst drift {report['worst']:.2e} "
              f"{'PASS' if report['passed'] else 'FAIL'} "
              f"(pred max {report['pred_max']:.2e})")
        if not report["passed"]:
            failed.append("int8_drift")

    print(f"\n{'PASS' if not failed else 'FAIL'}"
          + (f" — failed: {', '.join(failed)}" if failed else
             (f" — all gates within {args.gate:g}" if args.targets else
              " — prediction-drift heuristic passed (run with --targets"
              " for the 25-measure 1e-3 parity claim)")))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
