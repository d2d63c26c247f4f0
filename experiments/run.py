#!/usr/bin/env python
"""Run any of the reference's 111 experiments by name.

Examples:
    # list experiments
    python experiments/run.py --list
    # smoke-run the flagship SAUnet:L experiment on synthetic data (CPU ok)
    python experiments/run.py \
        --config exp180d_musicnet_unet_extremelylarge_doubleselfattn \
        --smoke
    # full run on precomputed features
    python experiments/run.py --config exp126a_musicnet_cnn_basic \
        --data-dir /data/MusicNet/hcqt --annot-dir /data/MusicNet/pitch \
        --out-dir runs/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", help="experiment name from the registry")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--data-dir")
    ap.add_argument("--annot-dir")
    ap.add_argument("--audio-dir",
                    help="train directly from .wav/.npy audio (with"
                         " --csv-dir annotations) — features computed"
                         " on device, no precompute step")
    ap.add_argument("--csv-dir")
    ap.add_argument("--chunk-frames", type=int, default=None,
                    help="streamed bounded-memory HCQT for --audio-dir")
    ap.add_argument("--schema", default=None,
                    help="annotation schema preset for --csv-dir"
                         " (io.NOTE_EVENT_SCHEMAS: musicnet, swd, bach10,"
                         " phenicx, csd); default auto-detects"
                         " MusicNet/SWD csv")
    ap.add_argument("--out-dir", default="runs")
    ap.add_argument("--smoke", action="store_true",
                    help="synthetic data + 1 epoch + shrunken model")
    ap.add_argument("--cpu", action="store_true", help="force CPU platform")
    ap.add_argument("--fix-val-split", action="store_true",
                    help="repair the reference's merged val prefixes")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--resume", action="store_true",
                    help="restore the experiment checkpoint and continue"
                         " training from the next epoch")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="write a jax.profiler trace of the run to DIR"
                         " (TensorBoard-loadable)")
    args = ap.parse_args()
    if args.schema is not None:
        # deferred import keeps --help/--list jax-free; validate at
        # startup rather than dying with a KeyError after the first
        # file's HCQT is already computed
        from multipitch_architectures_tpu.io.audio import \
            NOTE_EVENT_SCHEMAS
        if args.schema not in NOTE_EVENT_SCHEMAS:
            ap.error(f"--schema {args.schema!r} unknown; choose from "
                     f"{sorted(NOTE_EVENT_SCHEMAS)}")

    if args.cpu or args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from multipitch_architectures_tpu.experiments import (
        AudioCorpus, NpyCorpus, SyntheticCorpus, available_experiments,
        load_experiment, run_experiment)

    if args.list:
        for name in available_experiments():
            print(name)
        return

    cfg = load_experiment(args.config, fix_val_split=args.fix_val_split)
    if args.smoke:
        from multipitch_architectures_tpu.experiments import shrink_for_smoke

        cfg = shrink_for_smoke(cfg)
        corpus = SyntheticCorpus(cfg, frames=300)
        epochs = args.epochs or 1
    elif args.audio_dir:
        assert args.csv_dir, "--csv-dir required with --audio-dir"
        corpus = AudioCorpus(args.audio_dir, args.csv_dir,
                             chunk_frames=args.chunk_frames,
                             annotation_schema=args.schema)
        epochs = args.epochs
    else:
        assert args.data_dir and args.annot_dir, \
            "--data-dir/--annot-dir (or --audio-dir/--csv-dir) required" \
            " without --smoke"
        corpus = NpyCorpus(args.data_dir, args.annot_dir)
        epochs = args.epochs

    if args.profile:
        from multipitch_architectures_tpu.utils import profiling

        with profiling.trace(args.profile):
            results = run_experiment(cfg, corpus, args.out_dir,
                                     max_epochs_override=epochs,
                                     resume=args.resume)
    else:
        results = run_experiment(cfg, corpus, args.out_dir,
                                 max_epochs_override=epochs,
                                 resume=args.resume)
    if results.get("subsets"):
        fw = results["subsets"][0]["framewise_mean"]
        print(f"Framewise f_measure: {fw.get('f_measure')}")



if __name__ == "__main__":
    main()
