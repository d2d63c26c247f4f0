"""Multi-head attention with torch ``nn.MultiheadAttention`` weight layout and —
critically — the reference's *actual* runtime semantics.

The reference feeds ``(batch, tokens, embed)`` tensors into a torch-1.6
``nn.MultiheadAttention`` that expects ``(seq, batch, embed)``
(reference: libdl/nn_models/unet_cnns.py:148-159). As a consequence the
published models attend **across batch samples at each fixed token position**
rather than across tokens. We expose both behaviors:

- ``mode='cross_batch'``  — faithful to the reference as-published (default for
  parity configs). Predictions depend on batch composition, exactly as the
  reference's do.
- ``mode='cross_batch:<g>'`` — block-diagonal variant: the batch is split
  into consecutive groups of ``g`` samples and attention runs within each
  group independently (the last-resort group size is the whole batch when
  ``B < g``). A batch of ``k*g`` windows gives bit-for-bit the outputs of
  ``k`` separate ``g``-sized reference batches — this is how the windowed
  test protocol (DataLoader batch 50, exp180d…py:62-65) is fused into
  large single dispatches on TPU without changing its semantics.
- ``mode='tokens'``       — the intended semantics (attend over the flattened
  H*W token sequence within each sample); recommended for new training.

Weight layout matches torch so checkpoints port 1:1: packed ``in_proj_weight``
``(3E, E)`` (rows q;k;v), ``in_proj_bias`` ``(3E,)``, and ``out_proj``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def sinusoidal_positional_encoding(max_len: int, embed_dim: int) -> np.ndarray:
    """The reference's sinusoidal table (libdl/nn_models/unet_cnns.py:118-124)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, embed_dim, 2, dtype=np.float64) * (-np.log(10000.0) / embed_dim)
    )
    pe = np.zeros((max_len, embed_dim), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


def _attend(q, k, v, num_heads):
    """Scaled dot-product attention over axis 1 of (N, L, E) inputs."""
    n, l, e = q.shape
    hd = e // num_heads
    scale = 1.0 / np.sqrt(hd)

    def split(t):  # (N, L, E) -> (N, H, L, hd)
        return t.reshape(n, l, num_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q) * scale, split(k), split(v)
    logits = jnp.einsum("nhqd,nhkd->nhqk", qh, kh)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("nhqk,nhkd->nhqd", weights, vh)
    return out.transpose(0, 2, 1, 3).reshape(n, l, e)


class TorchMultiheadAttention(nn.Module):
    """torch-layout MHA core. Input/output: ``(B, S, E)``.

    ``mode='cross_batch'`` reproduces the reference passing (B, S, E) into a
    (L, N, E) interface: attention runs over the batch axis at each token.
    ``mode='tokens'`` attends over S within each batch element.
    """

    embed_dim: int
    num_heads: int = 8
    mode: str = "cross_batch"

    @nn.compact
    def __call__(self, q, k, v):
        e = self.embed_dim
        in_proj_weight = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (3 * e, e)
        )
        in_proj_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,))
        out_w = self.param(
            "out_proj_weight", nn.initializers.xavier_uniform(), (e, e)
        )
        out_b = self.param("out_proj_bias", nn.initializers.zeros, (e,))

        wq, wk, wv = jnp.split(in_proj_weight, 3, axis=0)
        bq, bk, bv = jnp.split(in_proj_bias, 3, axis=0)
        q = q @ wq.T + bq
        k = k @ wk.T + bk
        v = v @ wv.T + bv

        if self.mode == "cross_batch":
            # torch sees (L=B, N=S, E): per token position, attend over batch.
            q, k, v = (t.transpose(1, 0, 2) for t in (q, k, v))
            out = _attend(q, k, v, self.num_heads)
            out = out.transpose(1, 0, 2)
        elif self.mode.startswith("cross_batch:"):
            # block-diagonal: attend over the batch axis within consecutive
            # groups of g samples (g = whole batch when B < g), at each
            # fixed token position — k*g-sized batches reproduce k separate
            # g-sized reference batches exactly
            b, s, e_ = q.shape
            g = min(int(self.mode.split(":", 1)[1]), b)
            if b % g != 0:
                raise ValueError(
                    f"batch {b} not a multiple of attention group {g}")
            ng = b // g

            def regroup(t):  # (B,S,E) -> (ng*S, g, E)
                return (t.reshape(ng, g, s, e_).transpose(0, 2, 1, 3)
                        .reshape(ng * s, g, e_))

            out = _attend(regroup(q), regroup(k), regroup(v), self.num_heads)
            out = (out.reshape(ng, s, g, e_).transpose(0, 2, 1, 3)
                   .reshape(b, s, e_))
        elif self.mode == "tokens":
            out = _attend(q, k, v, self.num_heads)
        else:
            raise ValueError(f"unknown attention mode: {self.mode!r}")
        return out @ out_w.T + out_b
