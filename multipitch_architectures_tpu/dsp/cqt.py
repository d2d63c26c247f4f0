"""Constant-Q transform for TPU.

Algorithm (Schörkhuber & Klapuri; the same scheme librosa.cqt uses, which
produced the features the reference models were trained on — reference:
libdl/data_preprocessing/hcqt.py:66 calls ``librosa.cqt``):

- build complex constant-Q kernels for the TOP octave only;
- process octaves top-down, halving the sample rate (half-band FIR + 2:1
  decimation) and the hop between octaves, reusing the same kernels;
- frame each octave's signal (reflect-padded, centered) and apply the
  kernel bank as ONE real matmul ``frames @ [Re(K) | Im(K)]`` — this is the
  MXU-friendly formulation (no complex arithmetic, no FFT needed since the
  kernel bank is small and dense);
- magnitude = sqrt(re² + im²), scaled like librosa's ``scale=True``
  convention: a unit-amplitude sinusoid at bin k peaks at ≈ sqrt(l_k)/2
  where ``l_k = Q·fs/f_k`` is the (full-rate) filter length.

All shape/plan computation is host-side numpy (:class:`CqtPlan`); the
per-call compute path is pure jnp and jittable with static plan.
"""

import math
from dataclasses import dataclass, field
from functools import lru_cache, partial
import numpy as np
import jax
import jax.numpy as jnp


def _hann_periodic(n: int) -> np.ndarray:
    """Periodic (fftbins=True) Hann window, as librosa's filter builder uses."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def cqt_q(bins_per_octave: int, filter_scale: float = 1.0) -> float:
    return filter_scale / (2.0 ** (1.0 / bins_per_octave) - 1.0)


def _top_octave_kernels(fs: float, fmax_octave_low: float,
                        bins_per_octave: int, filter_scale: float):
    """Complex kernels for one octave [f_low, 2·f_low), centered in a
    common power-of-two window. Returns (kernels (n_fft, bpo) complex128,
    lengths (bpo,), n_fft)."""
    q = cqt_q(bins_per_octave, filter_scale)
    freqs = fmax_octave_low * 2.0 ** (np.arange(bins_per_octave) / bins_per_octave)
    lengths = q * fs / freqs
    n_fft = int(2 ** math.ceil(math.log2(lengths.max())))
    kernels = np.zeros((n_fft, bins_per_octave), dtype=np.complex128)
    for k, (f, l) in enumerate(zip(freqs, lengths)):
        ilen = int(np.ceil(l))
        win = _hann_periodic(ilen)
        t = np.arange(-(ilen // 2), ilen - ilen // 2)
        phi = win * np.exp(2j * np.pi * f * t / fs)
        phi /= np.sum(np.abs(phi))        # L1 norm (librosa norm=1)
        start = n_fft // 2 - ilen // 2
        kernels[start:start + ilen, k] = phi
    return kernels, lengths, n_fft


@lru_cache(maxsize=None)
def _halfband_taps(num_taps: int = 127, beta: float = 8.0) -> np.ndarray:
    """Linear-phase half-band low-pass (cutoff 0.25·fs) for 2:1 decimation."""
    from scipy.signal import firwin

    return firwin(num_taps, 0.5, window=("kaiser", beta)).astype(np.float64)


@dataclass(frozen=True)
class CqtPlan:
    """Static CQT configuration: kernels + geometry, hashable for jit."""

    fs: float
    hop: int
    fmin: float
    n_bins: int
    bins_per_octave: int
    filter_scale: float = 1.0
    exact: bool = False
    _data: tuple = field(default=None, repr=False, compare=False)

    @staticmethod
    def create(fs, hop, fmin, n_bins, bins_per_octave, filter_scale=1.0,
               exact=False):
        """``exact=True`` builds PER-OCTAVE full-rate kernel banks and
        skips the decimation chain entirely: the result matches the
        direct constant-Q definition (:func:`cqt_direct_numpy`) to f32
        rounding instead of the multirate scheme's ~3e-3 rel-to-peak
        kernel-reuse error (measured: perf/frontend_precision_study.py
        — the error is NOT the half-band filter, so no tap upgrade can
        remove it). Costs ~2 extra memory passes per octave of depth;
        use for gate-marginal audio-input serving (the F-gate budget is
        1e-3 and the multirate approximation alone consumes 9.6e-4 of
        it end-to-end, perf/results_r4_frontend_approx.txt)."""
        n_octaves = int(math.ceil(n_bins / bins_per_octave))
        if hop % (2 ** (n_octaves - 1)) != 0:
            raise ValueError(
                f"hop ({hop}) must be divisible by 2^(n_octaves-1) "
                f"(= {2 ** (n_octaves - 1)})")
        # top octave's lowest frequency
        f_low_top = fmin * 2.0 ** (n_octaves - 1)
        if f_low_top * 2.0 > fs / 2.0 * 1.01:
            raise ValueError("top octave exceeds Nyquist")
        if exact:
            krs, sqls, n_ffts = [], [], []
            for j in range(n_octaves):       # j=0 -> lowest octave
                kernels, lengths, n_fft = _top_octave_kernels(
                    fs, fmin * 2.0 ** j, bins_per_octave, filter_scale)
                krs.append(np.asarray(np.concatenate(
                    [kernels.real, -kernels.imag], axis=1), np.float32))
                sqls.append(np.asarray(np.sqrt(lengths), np.float32))
                n_ffts.append(n_fft)
            data = (tuple(map(_freeze, krs)), tuple(map(_freeze, sqls)),
                    tuple(n_ffts), n_octaves)
            return CqtPlan(fs, hop, fmin, n_bins, bins_per_octave,
                           filter_scale, exact=True, _data=data)
        kernels, lengths, n_fft = _top_octave_kernels(
            fs, f_low_top, bins_per_octave, filter_scale)
        # real matmul kernel: (n_fft, 2*bpo) = [Re | -Im] (conjugate corr.)
        kr = np.concatenate([kernels.real, -kernels.imag], axis=1)
        taps = _halfband_taps()
        data = (
            np.asarray(kr, np.float32),
            np.asarray(np.sqrt(lengths), np.float32),
            n_fft,
            n_octaves,
            np.asarray(taps, np.float32),
        )
        return CqtPlan(fs, hop, fmin, n_bins, bins_per_octave, filter_scale,
                       _data=tuple(map(_freeze, data)))


def _freeze(x):
    if isinstance(x, np.ndarray):
        return _HashableArray(x)
    return x


class _HashableArray:
    """numpy array wrapper hashable by identity (plans are cached/static)."""

    def __init__(self, a):
        self.a = a

    def __hash__(self):
        return id(self.a)

    def __eq__(self, other):
        return self is other


def _reflect_pad(y, pad):
    """Symmetric reflect pad that tolerates pad >= len(y) (repeated
    reflection), unlike jnp.pad(mode='reflect')."""
    while pad > 0:
        p = min(pad, y.shape[0] - 1)
        y = jnp.pad(y, (p, p), mode="reflect")
        pad -= p
    return y


def _frame_matmul(y, kr, n_fft, hop, n_frames):
    """Reflect-pad, frame (centered, stride=hop), and apply the kernel bank,
    producing exactly ``n_frames`` frames (edge-padded if the decimated
    signal ran one frame short).

    Implemented as an index gather + ONE (n_frames, n_fft)x(n_fft, 2bpo)
    MXU matmul. (A strided conv is mathematically the same but the TPU
    compiler's 1-D conv lowering takes minutes when stride << kernel.)
    """
    pad = n_fft // 2
    # ensure enough samples for n_frames strided windows
    need = (n_frames - 1) * hop + n_fft
    yp = _reflect_pad(y, pad)
    if yp.shape[0] < need:
        yp = jnp.pad(yp, (0, need - yp.shape[0]), mode="edge")
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(n_fft)[None, :])          # (T, n_fft)
    frames = jnp.take(yp, idx)
    return jnp.dot(frames, kr,
                   preferred_element_type=jnp.float32)  # (T, 2bpo)


def _decimate2(y, taps, row_len: int = 8192):
    """Half-band filter + 2:1 decimation (linear phase, 'same' alignment).

    Implemented as a batched conv over overlapped rows of ``row_len``
    input samples: the obvious single stride-2 conv over the full signal
    makes the TPU compiler explode (minutes-to-hours compile time scaling
    with output length), while the rowed form — identical outputs, halo
    of k-1 samples between rows — compiles in seconds and runs at HBM
    bandwidth. NB lax.conv flips the kernel; the half-band taps are
    symmetric so correlation == convolution here.
    """
    k = taps.shape[0]
    pad = k // 2
    yp = _reflect_pad(y, pad)
    n_out = (y.shape[0] + 1) // 2
    if y.shape[0] <= 2 * row_len:
        out = jax.lax.conv_general_dilated(
            yp[None, None, :], taps[None, None, ::-1], window_strides=(2,),
            padding="VALID", dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32,
        )[0, 0]
        return out[:n_out]
    rows_n = -(-y.shape[0] // row_len)
    total = rows_n * row_len + (k - 1)
    yp = jnp.pad(yp, (0, max(0, total - yp.shape[0])))
    main = jax.lax.slice(yp, (0,), (rows_n * row_len,)).reshape(rows_n,
                                                               row_len)
    halo = jnp.stack([
        jax.lax.dynamic_slice(yp, (r * row_len + row_len,), (k - 1,))
        for r in range(rows_n)
    ])
    rows = jnp.concatenate([main, halo], axis=1)     # (R, row_len + k - 1)
    out = jax.lax.conv_general_dilated(
        rows[:, None, :], taps[None, None, ::-1], window_strides=(2,),
        padding="VALID", dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )[:, 0, :]
    return out.reshape(-1)[:n_out]


def cqt(y, plan: CqtPlan, use_pallas: bool = False):
    """Magnitude CQT of ``y`` (1-D float array) → (n_bins, n_frames) f32.

    ``n_frames = len(y) // hop + 1`` (librosa centered-stft convention,
    matching the reference's frame-count expectation, hcqt.py:125).
    Jitted as ONE executable per (geometry, audio length) — kernels are
    traced arguments, so plans that differ only in fmin (e.g. the three
    base-harmonic CQTs of the efficient HCQT with equal octave counts)
    share a compile. The octave loop unrolls into a single XLA graph of
    frame gather+matmuls — or, with ``use_pallas=True``, into the fused
    gather+MXU+magnitude Pallas kernel per octave (ops/pallas_cqt.py).

    Exact plans (``CqtPlan.create(..., exact=True)``) run one full-rate
    gather+matmul per octave instead of the decimation chain —
    ``use_pallas`` is ignored there (the exact path is HBM-bound on the
    frame gather, not MXU-bound).
    """
    if plan.exact:
        krs, sqls, n_ffts, _ = plan._data
        return _cqt_exact_impl(
            jnp.asarray(y, jnp.float32),
            tuple(jnp.asarray(k.a) for k in krs),
            tuple(jnp.asarray(s.a) for s in sqls),
            hop=plan.hop, n_ffts=n_ffts, bpo=plan.bins_per_octave,
            n_bins=plan.n_bins)
    kr, sqrt_lengths, n_fft, n_octaves, taps = [
        d.a if isinstance(d, _HashableArray) else d for d in plan._data]
    return _cqt_impl(jnp.asarray(y, jnp.float32), jnp.asarray(kr),
                     jnp.asarray(sqrt_lengths), jnp.asarray(taps),
                     hop=plan.hop, n_fft=n_fft, n_octaves=n_octaves,
                     bpo=plan.bins_per_octave, n_bins=plan.n_bins,
                     use_pallas=use_pallas)


@partial(jax.jit, static_argnames=("hop", "n_ffts", "bpo", "n_bins"))
def _cqt_exact_impl(y, krs, sqls, *, hop, n_ffts, bpo, n_bins):
    """Exact CQT: per-octave full-rate kernel banks, no decimation.
    Matches :func:`cqt_direct_numpy` to f32 rounding (same centered
    reflect-padded correlation, same L1-normalized Hann kernels, same
    sqrt-length scaling) — the direct constant-Q definition as a stack
    of MXU matmuls. Octave j is bins [j·bpo, (j+1)·bpo) from fmin."""
    n_frames = y.shape[0] // hop + 1
    octaves = []
    for kr, sql, n_fft in zip(krs, sqls, n_ffts):
        ri = _frame_matmul(y, kr, n_fft, hop, n_frames)   # (T, 2bpo)
        re, im = ri[:, :bpo], ri[:, bpo:]
        octaves.append(jnp.sqrt(re * re + im * im + 1e-30) * sql)
    out = jnp.concatenate(octaves, axis=1)        # ascending frequency
    out = out[:, -n_bins:] if out.shape[1] != n_bins else out
    return out.T                                  # (n_bins, T)


@partial(jax.jit, static_argnames=("hop", "n_fft", "n_octaves", "bpo",
                                   "n_bins", "use_pallas"))
def _cqt_impl(y, kr, sqrt_lengths, taps_j, *, hop, n_fft, n_octaves, bpo,
              n_bins, use_pallas):
    n_frames = y.shape[0] // hop + 1
    octaves = []
    cur = y
    for k in range(n_octaves):
        if use_pallas:
            from ..ops.pallas_cqt import cqt_octave_pallas

            yp = _reflect_pad(cur, n_fft // 2)
            mag = cqt_octave_pallas(
                yp, kr, hop=hop, n_fft=n_fft, bpo=bpo, n_frames=n_frames,
                interpret=jax.default_backend() != "tpu")
        else:
            ri = _frame_matmul(cur, kr, n_fft, hop, n_frames)  # (T, 2bpo)
            re, im = ri[:, :bpo], ri[:, bpo:]
            mag = jnp.sqrt(re * re + im * im + 1e-30)
        mag = mag * (sqrt_lengths * np.sqrt(2.0 ** k))   # full-rate length scale
        octaves.append(mag)
        if k + 1 < n_octaves:
            cur = _decimate2(cur, taps_j)
            hop //= 2
    # stack: octave k covers bins [n_bins - (k+1)*bpo, n_bins - k*bpo)
    out = jnp.concatenate([octaves[k] for k in range(n_octaves - 1, -1, -1)],
                          axis=1)                         # (T, n_octaves*bpo)
    out = out[:, -n_bins:] if out.shape[1] != n_bins else out
    return out.T                                          # (n_bins, T)


def cqt_streamed(y, plan: CqtPlan, chunk_frames: int = 8192,
                 use_pallas: bool = False) -> np.ndarray:
    """Bounded-memory CQT for arbitrarily long recordings.

    Processes frame-aligned chunks, each with enough REAL-sample context
    that the kept frames equal the whole-recording computation: the
    context covers the deepest octave's kernel half-support plus the
    recursive half-band decimation chain's support, so segment-edge
    reflect padding never reaches a kept frame (the recording's true
    edges keep their reflect-padded semantics because the first/last
    segments start/end exactly at the signal boundary). Compiled size is
    bounded by ``chunk_frames`` regardless of recording length — the
    whole-recording :func:`cqt` materializes an (n_frames, n_fft) gather
    per octave, which is the memory blowup this avoids.

    Returns host numpy (n_bins, n_frames); chunks stream through the
    device one at a time.
    """
    hop = plan.hop
    y = np.asarray(y, np.float32)
    n_frames = len(y) // hop + 1
    if n_frames <= chunk_frames:
        return np.asarray(cqt(y, plan, use_pallas=use_pallas))

    if plan.exact:
        # lowest octave's full-rate window is the only edge reach
        ctx = plan._data[2][0] // 2
    else:
        kr, sqrt_lengths, n_fft, n_octaves, taps = [
            d.a if isinstance(d, _HashableArray) else d for d in plan._data]
        deep = 2 ** (n_octaves - 1)
        # deepest-octave kernel half-support + decimation-chain support,
        # in original-rate samples, rounded up to a whole hop so chunk
        # starts stay frame- and decimation-grid-aligned (hop % deep == 0)
        ctx = (n_fft // 2) * deep + (taps.shape[0] // 2) * 2 * deep
    ctx = -(-ctx // hop) * hop

    outs = []
    for c0 in range(0, n_frames, chunk_frames):
        c1 = min(n_frames, c0 + chunk_frames)
        s0 = max(0, c0 * hop - ctx)
        s1 = min(len(y), (c1 - 1) * hop + ctx)
        m = cqt(y[s0:s1], plan, use_pallas=use_pallas)
        local0 = c0 - s0 // hop
        outs.append(np.asarray(m[:, local0:local0 + (c1 - c0)]))
    return np.concatenate(outs, axis=1)


def cqt_direct_numpy(y, fs, hop, fmin, n_bins, bins_per_octave,
                     filter_scale=1.0):
    """Slow exact reference: direct time-domain correlation with full-rate
    constant-Q kernels at every bin (the mathematical definition; float64).
    Used by tests as the oracle for the fast multirate implementation."""
    q = cqt_q(bins_per_octave, filter_scale)
    y = np.asarray(y, np.float64)
    n_frames = len(y) // hop + 1
    out = np.zeros((n_bins, n_frames))
    freqs = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    lengths = q * fs / freqs
    max_len = int(np.ceil(lengths.max()))
    pad = max_len // 2 + 1
    yp = np.pad(y, (pad, pad), mode="reflect")
    for k, (f, l) in enumerate(zip(freqs, lengths)):
        ilen = int(np.ceil(l))
        win = _hann_periodic(ilen)
        t = np.arange(-(ilen // 2), ilen - ilen // 2)
        phi = win * np.exp(2j * np.pi * f * t / fs)
        phi /= np.sum(np.abs(phi))
        for tt in range(n_frames):
            center = tt * hop + pad
            seg = yp[center - ilen // 2: center - ilen // 2 + ilen]
            out[k, tt] = np.abs(np.vdot(phi, seg)) * np.sqrt(l)
    return out
