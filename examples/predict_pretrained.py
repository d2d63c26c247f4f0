#!/usr/bin/env python
"""Predict pitch salience with a (ported) pretrained checkpoint — the
equivalent of the reference's 02_predict_with_pretrained_model.ipynb.

Takes a torch ``state_dict`` .pt saved by the reference experiments, ports
it to flax (models/port.py) and runs framewise prediction over an audio
file or precomputed HCQT .npy.

Example (the notebook's PUnet checkpoint):
    python examples/predict_pretrained.py \
        --checkpoint RETRAIN4_exp195f_...pt \
        --model simple_u_net_polyphony_classif_softmax \
        --model-args '{"n_chan_layers": [128,180,150,100], "n_bins_out": 72,
                       "scalefac": 2, "num_polyphony_steps": 24}' \
        --hcqt some_file_hcqt.npy --out pred.npy
"""

import argparse
import json
import os
import sys

import numpy as np

# Persistent compile cache: prediction compiles in minutes cold through
# the TPU tunnel, seconds warm (same cache bench.py uses).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/multipitch_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def port_state_dict(model_name, sd):
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


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True, help="torch .pt state_dict")
    ap.add_argument("--model", required=True,
                    help="reference model class name")
    ap.add_argument("--model-args", default="{}", help="JSON kwargs")
    ap.add_argument("--hcqt", help="precomputed HCQT .npy (216, T, 6)")
    ap.add_argument("--audio", help="audio .npy/.wav (22.05 kHz)")
    ap.add_argument("--exact-frontend", action="store_true",
                    help="with --audio: exact per-octave full-rate CQT "
                    "(no multirate approximation; slower, for "
                    "gate-marginal serving)")
    ap.add_argument("--out", default="prediction.npy")
    ap.add_argument("--batch-size", type=int, default=50)
    ap.add_argument("--int8", action="store_true",
                    help="gated int8 serving mode: per-recording "
                         "calibrated W8A8 convs (eval.predict_framewise_"
                         "int8; ~11%% faster windowed serving, drift gate "
                         "measured <=1e-3 on trained checkpoints — "
                         "perf/gated_mode_experiment.py)")
    args = ap.parse_args()

    import torch

    import jax
    from multipitch_architectures_tpu.experiments.configs import build_model
    from multipitch_architectures_tpu.eval import predict_framewise

    sd = torch.load(args.checkpoint, map_location="cpu")
    variables = jax.tree.map(jax.numpy.asarray,
                             port_state_dict(args.model, sd))
    model = build_model(args.model, json.loads(args.model_args))

    if args.hcqt:
        inputs = np.transpose(np.load(args.hcqt), (2, 1, 0))
    else:
        from examples.precompute_features import load_audio  # noqa
        from multipitch_architectures_tpu.dsp import compute_efficient_hcqt

        audio = load_audio(args.audio, 22050)
        f, _, _ = compute_efficient_hcqt(audio, fs=22050, fs_hcqt_target=50,
                                         bins_per_octave=36, num_octaves=6,
                                         exact=args.exact_frontend)
        inputs = np.transpose(f, (2, 1, 0))

    def apply_fn(v, x):
        return model.apply(v, x, train=False)

    if args.int8:
        from multipitch_architectures_tpu.eval import predict_framewise_int8

        def run(**kw):
            return predict_framewise_int8(model, variables, inputs,
                                          batch_size=args.batch_size, **kw)
    else:
        def run(**kw):
            return predict_framewise(apply_fn, variables, inputs,
                                     batch_size=args.batch_size, **kw)

    if args.model.startswith("simple_u_net_polyphony") or \
            "polyphony" in args.model:
        pred, n_pred = run(return_aux=True)
        poly_out = args.out.replace(".npy", "_polyphony.npy")
        np.save(poly_out, n_pred)
        print(f"polyphony {n_pred.shape} -> {poly_out}")
    else:
        pred = run()
    np.save(args.out, pred)
    print(f"prediction {pred.shape} -> {args.out}")


if __name__ == "__main__":
    main()
