"""Host-side audio + annotation loading (reference notebook-01 inputs).

The reference's corpus enters as .wav + MusicNet-schema CSV
(data/MusicNet/csv; sample indices at 44.1 kHz). These helpers feed both
the precompute example and :class:`..experiments.runner.AudioCorpus`
(train directly from audio, no precompute step).
"""

import re
from dataclasses import dataclass
from typing import Optional, Union

import numpy as np

_NOTE_RE = re.compile(r"^([A-Ga-g])([#b]?)(-?\d+)$")
_NOTE_BASE = {"C": 0, "D": 2, "E": 4, "F": 5, "G": 7, "A": 9, "B": 11}


def note_name_to_midi(name: str) -> float:
    """Scientific pitch notation → MIDI (C4 = 60); e.g. 'A4' → 69."""
    m = _NOTE_RE.match(name.strip())
    if not m:
        raise ValueError(f"unparseable note name {name!r}")
    letter, accidental, octave = m.groups()
    midi = (_NOTE_BASE[letter.upper()]
            + {"#": 1, "b": -1, "": 0}[accidental]
            + 12 * (int(octave) + 1))
    return float(midi)


@dataclass(frozen=True)
class NoteEventSchema:
    """Column-map for a note-event annotation file (VERDICT r3 task 5):
    declares where onset/offset/pitch live and in which units, so any
    corpus's text annotations feed :class:`..experiments.runner.
    AudioCorpus` without a bespoke loader. Named presets for the Exp4
    corpora live in :data:`NOTE_EVENT_SCHEMAS`.

    Fields name a column by header (str) or position (int). ``sep=None``
    means whitespace. ``time_unit``: 'seconds' | 'ms' | 'samples' (uses
    ``source_fs``). ``pitch_unit``: 'midi' | 'hz' (69+12·log2(f/440)) |
    'name' (scientific notation, 'A4'→69). ``f0_track=True`` reads
    (time, f0) FRAME rows instead of note events — consecutive voiced
    frames become per-frame events (offset = next frame time), which the
    nooverlap rasterizer merges back into contiguous rolls (the
    ChoralSingingDataset ships per-singer f0 tracks, not note events)."""

    sep: Optional[str] = ","
    onset: Union[str, int] = 0
    offset: Union[str, int] = 1
    pitch: Union[str, int] = 2
    time_unit: str = "seconds"
    source_fs: float = 44100.0
    pitch_unit: str = "midi"
    header: Optional[bool] = None     # None = sniff (non-numeric 1st row)
    f0_track: bool = False


#: Best-effort presets for the public text exports of the Exp4 corpora
#: (the reference itself precomputes every corpus to .npy pitch rolls —
#: exp210d…py:160,631 — so these cover the DIRECT-from-audio path this
#: framework adds; override with a custom NoteEventSchema if your export
#: differs).
NOTE_EVENT_SCHEMAS = {
    # MusicNet csv: start_time/end_time as 44.1 kHz sample indices,
    # pitch in column 'note' (reference notebook 01, cell 7)
    "musicnet": NoteEventSchema(sep=",", onset="start_time",
                                offset="end_time", pitch="note",
                                time_unit="samples", source_fs=44100.0),
    # Schubert Winterreise ann_audio_note: semicolon csv, seconds
    "swd": NoteEventSchema(sep=";", onset="start", offset="end",
                           pitch="pitch"),
    # Bach10 note-event text export: whitespace 'onset offset midi',
    # times in MILLISECONDS (the dataset's GTNotes are 10 ms frames)
    "bach10": NoteEventSchema(sep=None, time_unit="ms"),
    # PHENICX-Anechoic score-aligned notes: 'onset,offset,notename'
    # in seconds (e.g. '0.917,1.476,A4')
    "phenicx": NoteEventSchema(sep=",", pitch_unit="name"),
    # ChoralSingingDataset per-singer f0 tracks: 'time_sec,f0_hz' frames
    "csd": NoteEventSchema(sep=",", onset=0, pitch=1, pitch_unit="hz",
                           f0_track=True),
}


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


def load_note_events(csv_path, source_fs: float = 44100.0,
                     schema: Union[None, str, NoteEventSchema] = None
                     ) -> np.ndarray:
    """Note-event file → (start_sec, end_sec, midi_pitch) rows.

    With ``schema=None``, two public schemas are auto-detected (they
    feed the Exp1-3 corpora):

    - MusicNet: comma-separated, ``start_time``/``end_time`` as SAMPLE
      indices at 44.1 kHz, pitch in column ``note``
      (01 notebook cell 7: sample indices / 44100);
    - SWD / Schubert Winterreise ``ann_audio_note``: SEMICOLON-separated
      with ``start``/``end`` already in seconds and a ``pitch`` column
      (the Exp3 corpus; detected via the ';' header + column names).

    Any other corpus (Bach10, PHENICX-Anechoic, ChoralSingingDataset, or
    your own) passes ``schema=`` — a :data:`NOTE_EVENT_SCHEMAS` preset
    name or a custom :class:`NoteEventSchema` column map. (The reference
    precomputes every corpus to .npy pitch rolls, exp210d…py:160; this
    direct path is a framework addition.)
    """
    if schema is not None:
        if isinstance(schema, str):
            schema = NOTE_EVENT_SCHEMAS[schema]
        return _load_note_events_schema(csv_path, schema)
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


def _load_note_events_schema(path, s: NoteEventSchema) -> np.ndarray:
    """Apply an explicit :class:`NoteEventSchema` column map."""
    import pandas as pd

    by_name = (isinstance(s.onset, str) or isinstance(s.offset, str)
               or isinstance(s.pitch, str))
    header = s.header
    if header is None and not by_name:
        with open(path) as f:
            first = (f.readline().split(s.sep) if s.sep
                     else f.readline().split())
        try:
            float(first[0])
            header = False
        except (ValueError, IndexError):
            header = True
    df = pd.read_csv(path, sep=s.sep if s.sep else r"\s+",
                     header=0 if (by_name or header) else None,
                     engine="python")

    def col(key):
        return df[key] if isinstance(key, str) else df[df.columns[key]]

    onset = col(s.onset).to_numpy(dtype=float)
    scale = {"seconds": 1.0, "ms": 1e-3,
             "samples": 1.0 / s.source_fs}[s.time_unit]
    onset = onset * scale

    raw_pitch = col(s.pitch)
    if s.pitch_unit == "midi":
        pitch = raw_pitch.to_numpy(dtype=float)
    elif s.pitch_unit == "hz":
        hz = raw_pitch.to_numpy(dtype=float)
        with np.errstate(divide="ignore"):
            pitch = 69.0 + 12.0 * np.log2(np.maximum(hz, 1e-12) / 440.0)
        pitch = np.where(hz > 0, np.round(pitch), -1.0)
    elif s.pitch_unit == "name":
        pitch = np.array([note_name_to_midi(str(v)) for v in raw_pitch])
    else:
        raise ValueError(f"unknown pitch_unit {s.pitch_unit!r}")

    if s.f0_track:
        # (time, f0) frame rows → one event per voiced frame; offset =
        # next frame time (last frame gets the median hop). The
        # nooverlap rasterizer merges adjacent same-pitch frames.
        if len(onset) == 0:
            return np.zeros((0, 3))
        hop = float(np.median(np.diff(onset))) if len(onset) > 1 else 0.01
        offset = np.concatenate([onset[1:], [onset[-1] + hop]])
        voiced = pitch >= 0
        return np.stack([onset[voiced], offset[voiced],
                         pitch[voiced]], axis=1)

    offset = col(s.offset).to_numpy(dtype=float) * scale
    return np.stack([onset, offset, pitch], axis=1)
