"""Host-side audio + annotation loading (reference notebook-01 inputs).

The reference's corpus enters as .wav + MusicNet-schema CSV
(data/MusicNet/csv; sample indices at 44.1 kHz). These helpers feed both
the precompute example and :class:`..experiments.runner.AudioCorpus`
(train directly from audio, no precompute step).
"""

import numpy as np


def load_audio(path, fs: int = 22050) -> np.ndarray:
    """Mono float32 audio at ``fs``: ``.npy`` raw audio passthrough, or
    ``.wav`` via scipy (stereo averaged, ints normalized, polyphase
    resample on rate mismatch)."""
    if path.endswith(".npy"):
        return np.asarray(np.load(path), np.float32)
    from scipy.io import wavfile

    rate, data = wavfile.read(path)
    # Normalize by the STORED dtype before any arithmetic: a stereo mean
    # would promote int16/uint8 samples to float64 and skip this branch,
    # serving features at ~3e4x the trained input scale.
    if data.dtype.kind == "i":
        data = data / np.iinfo(data.dtype).max
    elif data.dtype.kind == "u":
        # 8-bit WAVs are unsigned with a mid-scale zero (128 for uint8):
        # remove the DC offset, then scale to [-1, 1)
        half_range = (np.iinfo(data.dtype).max + 1) / 2.0
        data = (data.astype(np.float32) - half_range) / half_range
    elif data.dtype.kind != "f":
        raise ValueError(f"unsupported WAV sample format {data.dtype}")
    if data.ndim > 1:
        data = data.mean(axis=1)
    if rate != fs:
        from scipy.signal import resample_poly

        g = np.gcd(rate, fs)
        data = resample_poly(data, fs // g, rate // g)
    return np.asarray(data, np.float32)


def load_note_events(csv_path, source_fs: float = 44100.0) -> np.ndarray:
    """Note-event CSV → (start_sec, end_sec, midi_pitch) rows.

    Two public schemas are auto-detected (both feed the Exp1-4 corpora):

    - MusicNet: comma-separated, ``start_time``/``end_time`` as SAMPLE
      indices at 44.1 kHz, pitch in column ``note``
      (01 notebook cell 7: sample indices / 44100);
    - SWD / Schubert Winterreise ``ann_audio_note``: SEMICOLON-separated
      with ``start``/``end`` already in seconds and a ``pitch`` column
      (the Exp3 corpus; detected via the ';' header + column names).

    Other corpora (Bach10, PHENICX-Anechoic, ChoralSingingDataset) ship
    bespoke annotation formats — precompute those to .npy pitch rolls
    (examples/precompute_features.py) and use ``NpyCorpus``, exactly as
    the reference does for every corpus.
    """
    import pandas as pd

    with open(csv_path) as f:
        header = f.readline()
    sep = ";" if header.count(";") > header.count(",") else ","
    df = pd.read_csv(csv_path, sep=sep)
    cols = {c.lower().strip(): c for c in df.columns}
    if "start" in cols and "end" in cols and "pitch" in cols:
        # SWD schema: seconds already
        start = df[cols["start"]].to_numpy(dtype=float)
        end = df[cols["end"]].to_numpy(dtype=float)
        pitch = df[cols["pitch"]].to_numpy(dtype=float)
    else:
        start = df[cols.get("start_time", df.columns[0])].to_numpy() \
            / source_fs
        end = df[cols.get("end_time", df.columns[1])].to_numpy() / source_fs
        pitch = df[cols.get("note", df.columns[3])].to_numpy()
    return np.stack([start, end, pitch], axis=1)
