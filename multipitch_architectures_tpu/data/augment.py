"""On-device data augmentation as pure functions of a PRNG key.

Re-implements the reference's per-item augmentations
(libdl/data_loaders/hcqt_datasets.py:77-139) as vectorized jnp ops applied
in the SAME order: random EQ → additive noise → log compression → tuning
shift → transposition. Shapes: X (C, T, F) per sample (C=6 harmonics,
F=216 bins, 3 bins/semitone), y (1, 1, n_bins) center-frame target.

The only intentional deviations from the reference:

- The EQ rejection loop ("resample (α, β) until the parabola stays ≥ 0",
  hcqt_datasets.py:80-95) is replaced by sampling a fixed number of
  candidates and taking the first accepted one — identical distribution
  conditional on acceptance, but jit-compatible (no data-dependent loop).
- ``time_scale`` (the segm datasets' scipy-interp1d stretch,
  hcqt_datasets.py:211-226) keeps the OUTPUT length fixed and resamples
  the content at a random rate, because XLA needs static shapes; the
  models are time-length-invariant so training semantics are equivalent.
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

# per-harmonic-channel EQ center offsets in bins: channel 0 is the
# subharmonic (offset -36), channels h>=1 sit at 36*log2(h) bins
# (hcqt_datasets.py:87-92)
_EQ_OFFSETS = (-36, 0, 36, 57, 72, 83)


@dataclass(frozen=True)
class AugmentConfig:
    """Mirrors the reference's ``aug:*`` params (hcqt_datasets.py:46-55)."""

    transposition: Optional[int] = None      # aug:transpsemitones
    scalingfactor: Optional[float] = None    # aug:scalingfactor (segm only)
    randomeq: Optional[int] = None           # aug:randomeq (max alpha)
    noisestd: Optional[float] = None         # aug:noisestd
    tuning: bool = False                     # aug:tuning
    compression: Optional[float] = 10.0      # log(1 + gamma X)


def _edge_noise(key, shape, dtype):
    """|N(0, 1e-4)| used to fill rolled-in regions (hcqt_datasets.py:121)."""
    return jnp.abs(1e-4 * jax.random.normal(key, shape, dtype))


def random_eq(key, x, max_alpha: int, n_candidates: int = 16):
    """Random parabolic EQ over frequency with per-harmonic center offset.

    filt[c, f] = 1 - 2e-6*α*(f - (β - offset_c))², α ∈ [1, max_alpha],
    β ∈ [0, 216); (α, β) resampled until min filt ≥ 0.
    """
    c, t, f = x.shape
    ka, kb = jax.random.split(key)
    alphas = jax.random.randint(ka, (n_candidates,), 1, max_alpha + 1)
    betas = jax.random.randint(kb, (n_candidates,), 0, f)

    bins = jnp.arange(f)[None, None, :]                        # (1,1,F)
    offs = jnp.asarray(_EQ_OFFSETS[:c])[None, :, None]         # (1,C,1)
    centers = betas[:, None, None] - offs                      # (N,C,1)
    filt = 1.0 - 2e-6 * alphas[:, None, None] * (bins - centers) ** 2
    ok = filt.min(axis=(1, 2)) >= 0                            # (N,)
    pick = jnp.argmax(ok)      # first accepted candidate (always exists for
    idx = jnp.where(ok.any(), pick, 0)  # small alpha; fall back to cand 0)
    chosen = jnp.where(ok.any(), filt[idx], jnp.ones_like(filt[0]))
    return x * chosen[:, None, :].astype(x.dtype)


def random_noise(key, x, std: float):
    """X ← |X + N(0, std)| (hcqt_datasets.py:99-102)."""
    return jnp.abs(x + std * jax.random.normal(key, x.shape, x.dtype))


def log_compress(x, gamma: Optional[float]):
    """X ← log(1 + γX) (hcqt_datasets.py:105-106)."""
    if gamma is None:
        return x
    return jnp.log1p(gamma * x)


def random_tuning_shift(key, x):
    """Random tuning shift ∈ {-1, -0.5, 0, +0.5, +1} bins over frequency;
    half shifts interpolate adjacent bins; rolled-in edge bins get low
    noise (hcqt_datasets.py:108-124)."""
    kshift, knoise = jax.random.split(key)
    shift2 = jax.random.randint(kshift, (), -2, 3)   # shift in half-bins

    avg_up = jnp.concatenate(
        [x[..., :1], (x[..., :-1] + x[..., 1:]) / 2], axis=-1)
    avg_dn = jnp.concatenate(
        [(x[..., :-1] + x[..., 1:]) / 2, x[..., -1:]], axis=-1)
    roll_up = jnp.roll(x, 1, axis=-1)
    roll_dn = jnp.roll(x, -1, axis=-1)

    shifted = jnp.select(
        [shift2 == -2, shift2 == -1, shift2 == 0, shift2 == 1],
        [roll_dn, avg_dn, x, avg_up],
        roll_up,
    )
    noise = _edge_noise(knoise, x[..., :1].shape, x.dtype)
    lo = jnp.where(shift2 > 0, noise, shifted[..., :1])
    hi = jnp.where(shift2 < 0, noise, shifted[..., -1:])
    return jnp.concatenate([lo, shifted[..., 1:-1], hi], axis=-1)


def random_transposition(key, x, y, max_semitones: int):
    """Random transposition ±k semitones: X rolls by 3k bins, y by k bins;
    rolled-in X bins get low noise, rolled-in y bins are zeroed — except
    12-bin chroma targets, which keep the pure circular roll
    (hcqt_datasets.py:126-139)."""
    ktr, knoise = jax.random.split(key)
    transp = jax.random.randint(ktr, (), -max_semitones, max_semitones + 1)

    f = x.shape[-1]
    n_bins = y.shape[-1]
    x_rolled = jnp.roll(x, 3 * transp, axis=-1)
    y_rolled = jnp.roll(y, transp, axis=-1)

    # mask of rolled-in (wrap-around) bins
    bins_x = jnp.arange(f)
    wrap_x = jnp.where(transp >= 0, bins_x < 3 * transp,
                       bins_x >= f + 3 * transp)
    noise = _edge_noise(knoise, x_rolled.shape, x.dtype)
    x_out = jnp.where(wrap_x[None, None, :], noise, x_rolled)

    if n_bins == 12:
        y_out = y_rolled
    else:
        bins_y = jnp.arange(n_bins)
        wrap_y = jnp.where(transp >= 0, bins_y < transp,
                           bins_y >= n_bins + transp)
        y_out = jnp.where(wrap_y[None, None, :], 0.0, y_rolled)
    return x_out, y_out


def time_scale(key, x, max_factor: float, context: int):
    """Random time stretch of the segment interior (fixed output length):
    resample the interior frames at rate drawn like the reference's
    scalefac = 1/a + 2·U·(1 - 1/a) (hcqt_datasets.py:212)."""
    c, t, f = x.shape
    half = context // 2
    interior = x[:, half:t - half, :]
    n = interior.shape[1]
    u = jax.random.uniform(key)
    scalefac = 1.0 / max_factor + 2.0 * u * (1.0 - 1.0 / max_factor)
    # sample positions covering n/scalefac source frames, clipped
    pos = jnp.arange(n) / scalefac
    pos = jnp.clip(pos, 0, n - 1)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n - 1)
    frac = (pos - i0)[None, :, None]
    scaled = interior[:, i0, :] * (1 - frac) + interior[:, i1, :] * frac
    return jnp.concatenate([x[:, :half, :], scaled, x[:, t - half:, :]],
                           axis=1)


def augment_one(key, x, y, cfg: AugmentConfig, context: int = 75):
    """Apply the full augmentation chain to one (X, y) sample in the
    reference's order (EQ → noise → compression → tuning → transposition;
    scaling first for segment datasets)."""
    k_scale, k_eq, k_noise, k_tune, k_transp = jax.random.split(key, 5)
    if cfg.scalingfactor:
        x = time_scale(k_scale, x, cfg.scalingfactor, context)
    if cfg.randomeq:
        x = random_eq(k_eq, x, cfg.randomeq)
    if cfg.noisestd:
        x = random_noise(k_noise, x, cfg.noisestd)
    x = log_compress(x, cfg.compression)
    if cfg.tuning:
        x = random_tuning_shift(k_tune, x)
    if cfg.transposition:
        x, y = random_transposition(k_transp, x, y, cfg.transposition)
    return x, y


def augment_batch(key, x, y, cfg: AugmentConfig, context: int = 75):
    """vmapped :func:`augment_one` over the leading batch axis."""
    keys = jax.random.split(key, x.shape[0])
    return jax.vmap(lambda k, xi, yi: augment_one(k, xi, yi, cfg, context)
                    )(keys, x, y)
