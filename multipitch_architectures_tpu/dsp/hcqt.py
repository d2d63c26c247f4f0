"""Harmonic CQT feature frontend.

Re-implements the reference's feature pipeline
(libdl/data_preprocessing/hcqt.py) TPU-first:

- ``compute_hopsize_cqt`` — identical arithmetic (hcqt.py:9-30).
- ``compute_efficient_hcqt`` — the production variant both reference
  notebooks use (hcqt.py:89-164): one extended CQT per power-of-two
  "base harmonic" group, harmonics related by 2^k taken as octave-shifted
  slices. Each underlying CQT is the jittable multirate matmul CQT.
- ``compute_hcqt`` — the naive per-harmonic variant (hcqt.py:34-85).
- ``hcqt`` — the TPU-native entry point: given audio (and an optional
  precomputed tuning shift), returns the (n_bins, n_frames, n_harmonics)
  magnitude tensor as a device array.

Defaults reproduce the paper configuration: fs 22050, fmin C1, 60→36
bins/octave configurable (the experiments use bins_per_semitone=3 → 36),
5 harmonics + 1 subharmonic, target frame rate → hop 512, fs_hcqt 43.07 Hz.
"""

import math
from functools import lru_cache
from typing import Optional

import numpy as np
import jax.numpy as jnp

from .cqt import CqtPlan, cqt, cqt_streamed
from .tuning import estimate_tuning

C1_HZ = 32.70319566257483  # librosa.note_to_hz('C1')


def compute_hopsize_cqt(fs_cqt_target, fs=22050, num_octaves=7):
    """CQT hopsize approximating a target frame rate, constrained to a
    multiple of 2^(num_octaves-1) (reference hcqt.py:9-30)."""
    factor = 2 ** (num_octaves - 1)
    hopsize_target = fs / fs_cqt_target
    n = np.round(hopsize_target / factor)
    hopsize_cqt = int(max(1, factor * n))
    fs_cqt = fs / hopsize_cqt
    return hopsize_cqt, fs_cqt


def _centered_fmin(fmin, bins_per_octave, center_bins):
    """Shift fmin down so bin centers align to MIDI pitches when using
    multiple bins per semitone (reference hcqt.py:60-61, 119-120)."""
    if not center_bins:
        return fmin
    bins_per_semitone = bins_per_octave // 12
    return fmin / 2 ** ((bins_per_semitone - 1) / (2 * bins_per_octave))


@lru_cache(maxsize=32)
def _plan(fs, hop, fmin, n_bins, bins_per_octave, exact=False):
    return CqtPlan.create(fs, hop, fmin, n_bins, bins_per_octave,
                          exact=exact)


def _harmonic_layout(num_harmonics, num_subharmonics):
    """Group (sub)harmonics by power-of-two base, like the reference's
    base-harmonic search (hcqt.py:129-148): each harmonic h is assigned the
    first base b (in list order, subharmonics first) with h/b = 2^k."""
    harmonics = [1.0 / (n + 1) for n in range(num_subharmonics, 0, -1)]
    harmonics += [float(n) for n in range(1, num_harmonics + 1)]
    bases = []
    assignment = []
    for h in harmonics:
        for b in bases:
            r = math.log2(h / b)
            if abs(r - round(r)) < 1e-9 and r >= 0:
                assignment.append((b, int(round(r))))
                break
        else:
            bases.append(h)
            assignment.append((h, 0))
    return harmonics, assignment


def efficient_hcqt_device(f_audio, fs=22050, fmin=C1_HZ, fs_hcqt_target=91,
                          bins_per_octave=60, num_octaves=6, num_harmonics=5,
                          num_subharmonics=1, center_bins=True,
                          tuning: Optional[float] = 0.0,
                          use_pallas: Optional[bool] = None,
                          chunk_frames: Optional[int] = None,
                          exact: bool = False):
    """Efficient HCQT with zero host roundtrips: the whole pipeline stays
    on device; returns (jnp (n_harm, T, F) in the model layout, fs_hcqt,
    hopsize). ``tuning`` must be a number here (estimation is a host-side
    step; run :func:`estimate_tuning` separately if needed).

    ``use_pallas=None`` auto-selects: the fused Pallas octave kernel on
    TPU (bit-identical, ~30% faster than the XLA gather+matmul path,
    measured on v5e), XLA elsewhere (the Pallas interpreter is slow).

    ``chunk_frames`` switches to the bounded-memory streamed CQT
    (:func:`..dsp.cqt.cqt_streamed`) for arbitrarily long recordings —
    identical frames, chunks pass through the device one at a time, and
    the result is a HOST numpy array instead of a device array.

    ``exact=True`` replaces the multirate CQT engine with per-octave
    full-rate kernel banks (no decimation): features match the direct
    constant-Q definition to f32 rounding, removing the ~3e-3
    rel-to-peak kernel-reuse approximation that consumes 96% of the
    1e-3 F-gate budget end-to-end (perf/frontend_precision_study.py,
    perf/results_r4_frontend_approx.txt). Slower and more HBM-hungry —
    intended for gate-marginal audio-input serving, not training
    sweeps."""
    if use_pallas is None:
        import jax

        use_pallas = jax.default_backend() == "tpu"
    num_octaves_eff = num_octaves + int(
        np.ceil(np.log2(num_subharmonics + 1) + np.log2(num_harmonics)))
    hopsize_cqt, _ = compute_hopsize_cqt(fs_hcqt_target, fs=fs,
                                         num_octaves=num_octaves_eff)
    fs_hcqt = fs / hopsize_cqt
    assert bins_per_octave % 12 == 0, "bins_per_octave must be multiple of 12"
    fmin = _centered_fmin(fmin, bins_per_octave, center_bins)
    fmin_tuned = fmin * 2 ** (tuning / bins_per_octave)

    n_frames = int(len(f_audio) // hopsize_cqt) + 1
    n_bins = bins_per_octave * num_octaves
    harmonics, assignment = _harmonic_layout(num_harmonics, num_subharmonics)
    y = jnp.asarray(f_audio, jnp.float32)

    channels = [None] * len(harmonics)
    for base in sorted({b for b, _ in assignment}):
        max_shift = max(s for b, s in assignment if b == base)
        plan = _plan(float(fs), int(hopsize_cqt), float(fmin_tuned * base),
                     int((num_octaves + max_shift) * bins_per_octave),
                     int(bins_per_octave), exact=exact)
        if chunk_frames:
            f_cqt = cqt_streamed(y, plan, chunk_frames=chunk_frames,
                                 use_pallas=use_pallas)   # (bins, T) host
        else:
            f_cqt = cqt(y, plan, use_pallas=use_pallas)   # (bins, T) device
        for idx, (b, shift) in enumerate(assignment):
            if b != base:
                continue
            lo = shift * bins_per_octave
            channels[idx] = f_cqt[lo:lo + n_bins, :n_frames].T  # (T, F)
    stack = np.stack if chunk_frames else jnp.stack
    out = stack(channels, axis=0)                         # (n_harm, T, F)
    return out, fs_hcqt, hopsize_cqt


def compute_efficient_hcqt(f_audio, fs=22050, fmin=C1_HZ, fs_hcqt_target=91,
                           bins_per_octave=60, num_octaves=6, num_harmonics=5,
                           num_subharmonics=1, center_bins=True,
                           tuning: Optional[float] = None,
                           chunk_frames: Optional[int] = None,
                           exact: bool = False):
    """Efficient HCQT (reference hcqt.py:89-164): shared CQTs per base
    harmonic, octave-shifted slices for 2^k-related harmonics.

    Returns (f_hcqt (n_bins, n_frames, n_harm+n_sub) numpy f32, fs_hcqt,
    hopsize) — the reference's layout. ``tuning`` overrides the estimated
    tuning offset (in fractional bins); pass 0.0 to skip estimation.
    For an on-device, zero-roundtrip variant see
    :func:`efficient_hcqt_device`.
    """
    f_audio = np.asarray(f_audio, np.float32)
    if tuning is None:
        tuning = estimate_tuning(f_audio, fs=fs,
                                 bins_per_octave=bins_per_octave)
    out, fs_hcqt, hopsize_cqt = efficient_hcqt_device(
        f_audio, fs=fs, fmin=fmin, fs_hcqt_target=fs_hcqt_target,
        bins_per_octave=bins_per_octave, num_octaves=num_octaves,
        num_harmonics=num_harmonics, num_subharmonics=num_subharmonics,
        center_bins=center_bins, tuning=float(tuning),
        chunk_frames=chunk_frames, exact=exact)
    # (n_harm, T, F) -> reference layout (F, T, n_harm) numpy. The
    # streamed path returns a HOST array; transpose it on host (pushing
    # a multi-hour recording back through the device would defeat the
    # bounded-memory point).
    if chunk_frames:
        return np.ascontiguousarray(np.transpose(out, (2, 1, 0))), \
            fs_hcqt, hopsize_cqt
    return np.asarray(jnp.transpose(out, (2, 1, 0))), fs_hcqt, hopsize_cqt


def compute_hcqt(f_audio, fs=22050, fmin=C1_HZ, fs_hcqt_target=91,
                 bins_per_octave=60, num_octaves=6, num_harmonics=5,
                 num_subharmonics=1, center_bins=True,
                 tuning: Optional[float] = None):
    """Naive HCQT: one full CQT per (sub)harmonic (reference hcqt.py:34-85)."""
    f_audio = np.asarray(f_audio, np.float32)
    hopsize_cqt, _ = compute_hopsize_cqt(fs_hcqt_target, fs=fs,
                                         num_octaves=num_octaves)
    fs_hcqt = fs / hopsize_cqt
    assert bins_per_octave % 12 == 0
    fmin = _centered_fmin(fmin, bins_per_octave, center_bins)
    if tuning is None:
        tuning = estimate_tuning(f_audio, fs=fs,
                                 bins_per_octave=bins_per_octave)
    fmin_tuned = fmin * 2 ** (tuning / bins_per_octave)

    n_bins = num_octaves * bins_per_octave
    harmonics = [1.0 / (n + 1) for n in range(num_subharmonics, 0, -1)]
    harmonics += [float(n) for n in range(1, num_harmonics + 1)]
    mags = []
    for h in harmonics:
        plan = _plan(float(fs), int(hopsize_cqt), float(fmin_tuned * h),
                     int(n_bins), int(bins_per_octave))
        mags.append(np.asarray(cqt(f_audio, plan)))
    n_frames = min(m.shape[1] for m in mags)
    out = np.stack([m[:, :n_frames] for m in mags], axis=-1).astype(np.float32)
    return out, fs_hcqt, hopsize_cqt


def hcqt(f_audio, **kwargs):
    """Device-array convenience wrapper: HCQT in the model layout
    ``(n_harm, T, F)`` with no host roundtrip (tuning defaults to 0.0;
    pass ``tuning=None``-style estimation via compute_efficient_hcqt)."""
    kwargs.setdefault("tuning", 0.0)
    return efficient_hcqt_device(f_audio, **kwargs)
