"""Bilinear upsampling with ``align_corners=True`` semantics, as matmuls.

The reference U-Nets upsample with ``nn.Upsample(scale_factor, mode='bilinear',
align_corners=True)`` (reference: libdl/nn_models/unet_cnns.py:85-104).
``jax.image.resize`` implements half-pixel-center (align_corners=False)
sampling only, so we build the (static-shape) interpolation operator
explicitly and apply it as two small matmuls — which XLA maps onto the MXU,
making this *faster* than a gather-based resize on TPU.
"""

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


@lru_cache(maxsize=None)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) linear-interpolation operator, align_corners=True."""
    w = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1 or n_out == 1:
        w[:, 0] = 1.0
        return w
    pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    i0 = np.floor(pos).astype(np.int64)
    i0 = np.minimum(i0, n_in - 2)
    frac = pos - i0
    w[np.arange(n_out), i0] = (1.0 - frac).astype(np.float32)
    w[np.arange(n_out), i0 + 1] += frac.astype(np.float32)
    return w


def upsample_bilinear_align_corners(x, size):
    """Upsample NHWC ``x`` to spatial ``size=(H_out, W_out)``.

    Matches ``torch.nn.Upsample(mode='bilinear', align_corners=True)``.
    """
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = size
    a_h = jnp.asarray(_interp_matrix(h_in, h_out))
    a_w = jnp.asarray(_interp_matrix(w_in, w_out))
    x = jnp.einsum("Hh,bhwc->bHwc", a_h, x)
    x = jnp.einsum("Ww,bhwc->bhWc", a_w, x)
    return x


def up_concat_pad(x1, x2, upsamp_fac=(2, 2)):
    """Upsample ``x1`` by ``upsamp_fac``, zero-pad to ``x2``'s spatial size,
    concat ``[x2, x1]`` along channels (NHWC).

    Semantics of the reference ``unet_up_concat_padding``
    (libdl/nn_models/unet_cnns.py:85-104): F.pad order is
    (left=dW//2, right=dW-dW//2, top=dH//2, bottom=dH-dH//2) and the skip
    tensor comes first in the concat.
    """
    h1, w1 = x1.shape[1] * upsamp_fac[0], x1.shape[2] * upsamp_fac[1]
    x1 = upsample_bilinear_align_corners(x1, (h1, w1))
    dh = x2.shape[1] - x1.shape[1]
    dw = x2.shape[2] - x1.shape[2]
    x1 = jnp.pad(
        x1,
        ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)),
    )
    return jnp.concatenate([x2, x1], axis=-1)
