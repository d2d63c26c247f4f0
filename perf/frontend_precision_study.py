"""Decompose the multirate-CQT error and test cheap precision knobs.

Round-4 measured the END-TO-END consequence of the production frontend's
multirate approximation: worst-of-25-measures drift 9.6e-4 vs the 1e-3
F-gate (perf/results_r4_frontend_approx.txt) — a PASS with only 4%
headroom. This study (VERDICT r4 task 6) decides where to buy headroom
by decomposing the 1.45e-2 rel-to-peak feature gap into its two
candidate sources:

  A. the 2:1 half-band decimation chain (transition-band droop +
     stopband aliasing at each stage), and
  B. kernel reuse across rates (the top-octave kernels are built once
     with ceil(length) at the top rate; at rate fs/2^k the effective
     window quantization differs from per-octave full-rate kernels —
     the approximation librosa's recursive CQT shares).

Method: float64 numpy re-implementation of exactly the production
algorithm (same kernels, same frame alignment as dsp/cqt.py::_cqt_impl)
with swappable decimators:
  - kaiser(127, 8.0)  — the production default;
  - kaiser(255,12.0), kaiser(511,14.0) — longer/sharper half-bands;
  - ideal FFT brick-wall decimator — isolates source B (any residual
    gap with a perfect decimator is kernel-reuse error that NO
    half-band upgrade can remove).

Gap metric: max |variant - oracle| / oracle.max() (rel-to-peak,
matching results_r4_frontend_approx.txt), with the oracle =
cqt_direct_numpy (direct full-rate correlation, float64). Measured on
the HCQT's most error-prone base-harmonic geometry (the deepest
decimation chain: base 0.5, 9 effective octaves). Reported over ALL
frames and over INTERIOR frames (centers further from either signal
edge than both paths' support: the lowest bin's full-rate half-kernel
and the deepest octave's n_fft/2 · 2^(n_oct-1) reach) — edge frames
mix reflect-padding semantics that differ between the two paths by
construction and dominate the all-frames number on short clips; the
production F-gate measurement runs whole recordings where edge frames
are a vanishing share. Also reports the production variant's
per-octave interior gap to locate the error.

Run on CPU: python perf/frontend_precision_study.py
Results: perf/results_r5_frontend_precision.txt
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multipitch_architectures_tpu.dsp.cqt import (_hann_periodic,
                                                  _top_octave_kernels,
                                                  cqt_direct_numpy, cqt_q)
from multipitch_architectures_tpu.dsp.hcqt import (_centered_fmin,
                                                   compute_hopsize_cqt)

FS = 22050


def synth(dur_s, seed):
    rng = np.random.RandomState(seed)
    t = np.arange(int(dur_s * FS)) / FS
    audio = np.zeros_like(t)
    for midi in rng.choice(np.arange(36, 84), 8, replace=False):
        f0 = 440.0 * 2.0 ** ((midi - 69) / 12.0)
        for h in range(1, 6):
            audio += (0.2 / h) * np.sin(2 * np.pi * f0 * h * t
                                        + rng.uniform(0, 2 * np.pi))
    return (audio + 1e-4 * rng.randn(len(t))).astype(np.float64)


def halfband(num_taps, beta):
    from scipy.signal import firwin

    return firwin(num_taps, 0.5, window=("kaiser", beta)).astype(np.float64)


def decimate_fir(y, taps):
    """Match dsp/cqt.py::_decimate2 exactly: reflect pad k//2, 'VALID'
    stride-2 correlation (symmetric taps), n_out=(n+1)//2."""
    k = len(taps)
    pad = k // 2
    yp = np.pad(y, (pad, pad), mode="reflect")
    full = np.convolve(yp, taps[::-1], mode="valid")
    return full[::2][:(len(y) + 1) // 2]


def decimate_ideal(y):
    """FFT brick-wall low-pass at 0.25*fs then 2:1 — an ideal decimator
    (periodic-extension edge semantics; edges excluded from the metric
    would matter only at <1e-6 for these lengths)."""
    n = len(y)
    Y = np.fft.rfft(y)
    f = np.fft.rfftfreq(n)
    Y[f > 0.25] = 0.0
    y_lp = np.fft.irfft(Y, n)
    return y_lp[::2][:(n + 1) // 2]


def multirate_cqt_f64(y, fs, hop, fmin, n_bins, bins_per_octave, decimate):
    """float64 twin of dsp/cqt.py::_cqt_impl (same kernels, same centered
    reflect-padded framing, same sqrt-length scaling). Returns
    ((n_bins, T), n_fft) — n_fft sizes the interior mask."""
    import math

    n_octaves = int(math.ceil(n_bins / bins_per_octave))
    f_low_top = fmin * 2.0 ** (n_octaves - 1)
    kernels, lengths, n_fft = _top_octave_kernels(fs, f_low_top,
                                                  bins_per_octave, 1.0)
    n_frames = len(y) // hop + 1
    octaves = []
    cur = y.copy()
    h = hop
    for k in range(n_octaves):
        pad = n_fft // 2
        yp = np.pad(cur, (pad, pad), mode="reflect")
        need = (n_frames - 1) * h + n_fft
        if len(yp) < need:
            yp = np.pad(yp, (0, need - len(yp)), mode="edge")
        idx = (np.arange(n_frames)[:, None] * h + np.arange(n_fft)[None, :])
        frames = yp[idx]
        coef = frames @ kernels                      # (T, bpo) complex
        mag = np.abs(coef) * np.sqrt(lengths * 2.0 ** k)
        octaves.append(mag)
        if k + 1 < n_octaves:
            cur = decimate(cur)
            h //= 2
    out = np.concatenate([octaves[k] for k in range(n_octaves - 1, -1, -1)],
                         axis=1)
    return out[:, -n_bins:].T, n_fft                 # (n_bins, T)


def main():
    dur = float(os.environ.get("STUDY_DUR", "12.0"))
    y = synth(dur, seed=7)

    # deepest-chain geometry: the HCQT's base-0.5 subharmonic CQT spans
    # num_octaves_eff = 6 + ceil(log2(2) + log2(5)) = 9 octaves of
    # extended bins in production; its *lowest* octave decimates 8x.
    # Use the production hop for 9 effective octaves and the full
    # 9-octave extended CQT (fmin at the subharmonic base).
    bpo = 36
    num_octaves_eff = 9
    hop, _ = compute_hopsize_cqt(50, fs=FS, num_octaves=num_octaves_eff)
    fmin = _centered_fmin(32.70319566257483, bpo, True) * 0.5
    n_bins = 9 * bpo     # the production base-0.5 extended CQT:
    # (num_octaves + max_shift) = 6 + 3 octaves, top bin ~8.4 kHz < Nyq

    print(f"clip {dur:.1f}s, hop {hop}, fmin {fmin:.3f} Hz, "
          f"{n_bins} bins ({n_bins // bpo} octaves, "
          f"{n_bins // bpo - 1} decimation stages)")
    print("computing direct-DFT oracle (float64)...")
    oracle = cqt_direct_numpy(y, FS, hop, fmin, n_bins, bpo)
    peak = oracle.max()

    # interior mask: frame centers clear of both paths' edge reach
    q = cqt_q(bpo)
    lowbin_half = (q * FS / fmin) / 2.0                  # oracle support
    n_frames = oracle.shape[1]

    variants = [
        ("kaiser(127, 8)  [production]", lambda s: decimate_fir(
            s, halfband(127, 8.0))),
        ("kaiser(255, 12)", lambda s: decimate_fir(s, halfband(255, 12.0))),
        ("kaiser(511, 14)", lambda s: decimate_fir(s, halfband(511, 14.0))),
        ("ideal brick-wall [isolates kernel-reuse error]", decimate_ideal),
    ]
    print(f"\n{'decimator':<48s} {'all-frames gap':>15s} "
          f"{'interior gap':>13s}")
    gaps, interior_gaps = {}, {}
    mags = {}
    interior = None
    for name, dec in variants:
        m, n_fft = multirate_cqt_f64(y, FS, hop, fmin, n_bins, bpo, dec)
        if interior is None:
            deep_reach = (n_fft // 2) * 2 ** (n_bins // bpo - 1)
            margin = max(lowbin_half, deep_reach)
            centers = np.arange(n_frames) * hop
            interior = (centers >= margin) & (centers <= len(y) - margin)
            print(f"(interior: {interior.sum()}/{n_frames} frames, "
                  f"margin {margin / FS:.2f}s)")
        mags[name] = m
        gaps[name] = np.abs(m - oracle).max() / peak
        interior_gaps[name] = (
            np.abs(m[:, interior] - oracle[:, interior]).max() / peak)
        print(f"{name:<48s} {gaps[name]:15.3e} "
              f"{interior_gaps[name]:13.3e}")
        sys.stdout.flush()

    prod_name, ideal_name = variants[0][0], variants[-1][0]
    print("\nproduction per-octave interior gap (octave 0 = lowest "
          "bins, deepest decimation):")
    for k in range(n_bins // bpo):
        sl = slice(k * bpo, (k + 1) * bpo)
        g = np.abs(mags[prod_name][sl][:, interior]
                   - oracle[sl][:, interior]).max() / peak
        gi = np.abs(mags[ideal_name][sl][:, interior]
                    - oracle[sl][:, interior]).max() / peak
        print(f"  octave {k}: production {g:9.3e}   ideal-decim {gi:9.3e}")

    ideal = interior_gaps[ideal_name]
    prod = interior_gaps[prod_name]
    print(f"\nkernel-reuse floor (ideal decimator, interior): {ideal:.3e}")
    print(f"decimation's share of the production interior gap: "
          f"{(1.0 - ideal / prod) * 100.0:.0f}%")
    if interior_gaps[variants[1][0]] < 0.5 * prod:
        print("=> longer half-band taps buy real headroom; "
              "thread a quality knob through CqtPlan")
    elif ideal > 0.5 * prod:
        print("=> kernel reuse dominates; half-band upgrades cannot fix "
              "it — an exact-DFT frontend option is the only route")


if __name__ == "__main__":
    main()
