#!/usr/bin/env python
"""Precompute HCQT features + pitch annotations for a corpus — the
equivalent of the reference's 01_precompute_features.ipynb.

For each ``<name>.wav`` (or ``.npy`` raw audio) in --audio-dir with a
matching ``<name>.csv|.txt`` note-event file (MusicNet/SWD schemas
auto-detected; Bach10 / PHENICX-Anechoic / ChoralSingingDataset and
custom formats via ``--schema`` — io.NOTE_EVENT_SCHEMAS), writes:

    <out>/hcqt/<name>.npy   (216, T, 6)  float32   (reference layout)
    <out>/pitch/<name>.npy  (128, T)     float32

Audio loading: .npy (mono float at --fs) or .wav via scipy.io.wavfile.
"""

import argparse
import os
import sys

import numpy as np

# Persistent compile cache: the HCQT jit costs minutes cold through the
# TPU tunnel, seconds warm (same cache bench.py and perf/ use).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/multipitch_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multipitch_architectures_tpu.dsp import (  # noqa: E402
    compute_annotation_array_nooverlap, compute_efficient_hcqt)
from multipitch_architectures_tpu.io import (  # noqa: E402
    load_audio, load_note_events)
from multipitch_architectures_tpu.io.audio import \
    NOTE_EVENT_SCHEMAS  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--audio-dir", required=True)
    ap.add_argument("--csv-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--fs", type=int, default=22050)
    ap.add_argument("--fs-hcqt-target", type=float, default=50)
    ap.add_argument("--bins-per-octave", type=int, default=36)
    ap.add_argument("--chunk-frames", type=int, default=None,
                    help="bounded-memory streamed HCQT for long"
                         " recordings (dsp.cqt_streamed)")
    ap.add_argument("--exact-frontend", action="store_true",
                    help="exact per-octave full-rate CQT (no multirate "
                    "approximation; slower, for gate-marginal serving)")
    ap.add_argument("--schema", default=None,
                    choices=sorted(NOTE_EVENT_SCHEMAS),
                    help="annotation schema preset (io.NOTE_EVENT_SCHEMAS);"
                         " default auto-detects MusicNet/SWD csv")
    args = ap.parse_args()

    os.makedirs(os.path.join(args.out_dir, "hcqt"), exist_ok=True)
    os.makedirs(os.path.join(args.out_dir, "pitch"), exist_ok=True)
    for fn in sorted(os.listdir(args.audio_dir)):
        name, ext = os.path.splitext(fn)
        if ext not in (".wav", ".npy"):
            continue
        audio = load_audio(os.path.join(args.audio_dir, fn), args.fs)
        f_hcqt, fs_hcqt, _ = compute_efficient_hcqt(
            audio, fs=args.fs, fs_hcqt_target=args.fs_hcqt_target,
            bins_per_octave=args.bins_per_octave, num_octaves=6,
            chunk_frames=args.chunk_frames, exact=args.exact_frontend)
        annot = os.path.join(args.csv_dir, name + ".csv")
        if not os.path.exists(annot):
            annot = os.path.join(args.csv_dir, name + ".txt")
        events = load_note_events(annot, schema=args.schema)
        roll = compute_annotation_array_nooverlap(
            events, f_hcqt.shape[1], fs_hcqt, annot_type="pitch")
        np.save(os.path.join(args.out_dir, "hcqt", name + ".npy"),
                f_hcqt.astype(np.float32))
        np.save(os.path.join(args.out_dir, "pitch", name + ".npy"),
                roll.astype(np.float32))
        print(f"{name}: hcqt {f_hcqt.shape}, roll {roll.shape}")


if __name__ == "__main__":
    main()
