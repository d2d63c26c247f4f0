"""Bidirectional multi-layer LSTM with torch ``nn.LSTM`` weight layout,
implemented as ``lax.scan`` so XLA pipelines the recurrence on TPU.

Gate packing follows torch (reference uses ``nn.LSTM(..., bidirectional=True)``,
libdl/nn_models/unet_cnns.py:220-243): weights ``weight_ih_l{k}`` of shape
``(4H, in)`` with rows ordered [i; f; g; o], plus ``weight_hh_l{k}``,
``bias_ih_l{k}``, ``bias_hh_l{k}``; ``_reverse`` suffix for the backward
direction; layer-k>0 input is the concat of both directions (2H).
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def _lstm_scan(x, w_ih, w_hh, b, h0, c0, reverse=False):
    """x: (T, B, I) -> outputs (T, B, H). ``b = b_ih + b_hh`` precombined."""
    # Hoist the input projection out of the scan: one big MXU matmul.
    x_proj = jnp.einsum("tbi,gi->tbg", x, w_ih) + b

    def step(carry, xp):
        h, c = carry
        gates = xp + h @ w_hh.T
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    _, ys = jax.lax.scan(step, (h0, c0), x_proj, reverse=reverse)
    return ys


class TorchLSTM(nn.Module):
    """Input/output ``(B, T, features)`` (batch_first, like the reference)."""

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x):
        b, t, _ = x.shape
        hs = self.hidden_size
        num_dir = 2 if self.bidirectional else 1

        def uniform_init(key, shape, dtype=jnp.float32):
            bound = 1.0 / np.sqrt(hs)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        out = x.transpose(1, 0, 2)  # (T, B, I)
        for layer in range(self.num_layers):
            in_size = out.shape[-1]
            dir_outs = []
            for direction in range(num_dir):
                sfx = f"l{layer}" + ("_reverse" if direction == 1 else "")
                w_ih = self.param(f"weight_ih_{sfx}", uniform_init, (4 * hs, in_size))
                w_hh = self.param(f"weight_hh_{sfx}", uniform_init, (4 * hs, hs))
                b_ih = self.param(f"bias_ih_{sfx}", uniform_init, (4 * hs,))
                b_hh = self.param(f"bias_hh_{sfx}", uniform_init, (4 * hs,))
                h0 = jnp.zeros((b, hs), dtype=x.dtype)
                c0 = jnp.zeros((b, hs), dtype=x.dtype)
                dir_outs.append(
                    _lstm_scan(out, w_ih, w_hh, b_ih + b_hh, h0, c0,
                               reverse=direction == 1)
                )
            out = jnp.concatenate(dir_outs, axis=-1) if num_dir == 2 else dir_outs[0]
        return out.transpose(1, 0, 2)  # (B, T, num_dir*H)
