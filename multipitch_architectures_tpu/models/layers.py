"""Shared building blocks for the model zoo.

All modules operate in NHWC layout ``(batch, time, freq, channels)`` — the
layout TPU conv units want — while the public model classes accept the
reference's NCHW ``(batch, harmonics, time, freq)`` at the boundary.

Each block documents the reference construct it re-implements
(file:line cites refer to /root/reference).
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.attention import TorchMultiheadAttention, sinusoidal_positional_encoding
from ..ops.lstm import TorchLSTM


def leaky_relu(x, negative_slope):
    return jax.nn.leaky_relu(x, negative_slope)


def max_pool2d(x, kernel, stride=None, padding=(0, 0)):
    """torch ``nn.MaxPool2d`` semantics on NHWC input (implicit -inf padding,
    floor output size)."""
    stride = stride or kernel
    return nn.max_pool(
        x,
        window_shape=kernel,
        strides=stride,
        padding=((padding[0], padding[0]), (padding[1], padding[1])),
    )


class HarmonicLayerNorm(nn.Module):
    """LayerNorm jointly over (channels, freq), time-invariant.

    Equivalent to the reference's ``nn.LayerNorm([n_chan, n_bins])`` applied to
    ``x.transpose(1, 2)`` (basic_cnns.py:30,160): every (batch, time) position
    is normalized over all channel x freq elements, with a (freq, channel)
    affine (torch stores it (channel, freq); the porter transposes).
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):  # x: (B, T, F, C)
        return nn.LayerNorm(
            epsilon=self.epsilon,
            reduction_axes=(-2, -1),
            feature_axes=(-2, -1),
            name="ln",
        )(x)


class ConvBlock(nn.Module):
    """Conv2d -> LeakyReLU -> optional MaxPool -> Dropout.

    The workhorse of the basic CNN family, e.g. conv1/conv2 in
    basic_cnns.py:162-174 (conv 15x15 + lrelu + pool(3,1)s1p(1,0) + dropout).
    """

    features: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    a_lrelu: float = 0.3
    p_dropout: float = 0.2
    pool_kernel: Optional[Tuple[int, int]] = None
    pool_stride: Optional[Tuple[int, int]] = None
    pool_padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            kernel_size=self.kernel,
            strides=self.stride,
            padding=(
                (self.padding[0], self.padding[0]),
                (self.padding[1], self.padding[1]),
            ),
            name="conv",
        )(x)
        x = leaky_relu(x, self.a_lrelu)
        if self.pool_kernel is not None:
            x = max_pool2d(x, self.pool_kernel, self.pool_stride, self.pool_padding)
        x = nn.Dropout(self.p_dropout)(x, deterministic=not train)
        return x


class DoubleConv(nn.Module):
    """Two Conv-BN-ReLU stages with the reference's option set
    (unet_cnns.py:30-82):

    - ``convdrop``: None selects the plain branch; a number (including the
      default 0!) inserts Dropout(p=convdrop) after each stage.
    - ``alt_order``: pre-activation ordering ELU-BN-Dropout-Conv (x2).
    - ``residual``: adds a 1x1-conv-resized shortcut.
    """

    out_channels: int
    mid_channels: Optional[int] = None
    kernel: Tuple[int, int] = (3, 3)
    padding: Tuple[int, int] = (1, 1)
    convdrop: Optional[float] = 0.0
    residual: bool = False
    alt_order: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.mid_channels or self.out_channels
        pad = ((self.padding[0], self.padding[0]), (self.padding[1], self.padding[1]))
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        conv = lambda feats, name: nn.Conv(
            feats, kernel_size=self.kernel, padding=pad, name=name
        )
        drop = lambda h: (
            nn.Dropout(self.convdrop)(h, deterministic=not train)
            if self.convdrop is not None
            else h
        )

        h = x
        if not self.alt_order:
            h = conv(mid, "conv1")(h)
            h = bn("bn1")(h)
            h = nn.relu(h)
            h = drop(h)
            h = conv(self.out_channels, "conv2")(h)
            h = bn("bn2")(h)
            h = nn.relu(h)
            h = drop(h)
        else:
            h = jax.nn.elu(h)
            h = bn("bn1")(h)
            h = drop(h)
            h = conv(mid, "conv1")(h)
            h = jax.nn.elu(h)
            h = bn("bn2")(h)
            h = drop(h)
            h = conv(self.out_channels, "conv2")(h)

        if self.residual:
            shortcut = nn.Conv(
                self.out_channels, kernel_size=(1, 1), padding="VALID", name="resize"
            )(x)
            h = shortcut + h
        return h


class SingleConvSELU(nn.Module):
    """Conv2d -> SELU. The reference's ``single_conv`` / ``single_conv_SELU``
    blocks are broken/undefined (unet_cnns.py:13-27, :1558); this is the
    working equivalent their call sites clearly intend, making the
    ``freq_u_net*`` family constructible."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    padding: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            kernel_size=self.kernel,
            padding=(
                (self.padding[0], self.padding[0]),
                (self.padding[1], self.padding[1]),
            ),
            name="conv",
        )(x)
        return jax.nn.selu(x)


def max_pool_with_indices_freq(x, k):
    """Max-pool NHWC ``x`` along the freq axis by exact factor ``k``,
    returning (pooled, argmax indices) for later unpooling.

    Used by the ``freq_u_net`` family (MaxPool2d((1,k), return_indices=True),
    unet_cnns.py:1557-1561). Freq dims divide exactly (216 = 3*4*6*3)."""
    b, t, f, c = x.shape
    xr = x.reshape(b, t, f // k, k, c)
    idx = jnp.argmax(xr, axis=3)
    pooled = jnp.max(xr, axis=3)
    return pooled, idx


def max_unpool_freq(x, idx, k):
    """Inverse of :func:`max_pool_with_indices_freq` (zeros elsewhere)."""
    b, t, f, c = x.shape
    onehot = jax.nn.one_hot(idx, k, dtype=x.dtype, axis=3)  # (B,T,F,k,C)
    out = x[:, :, :, None, :] * onehot
    return out.reshape(b, t, f * k, c)


class TransformerEncLayer(nn.Module):
    """Post-norm transformer encoder over the flattened (H*W) token sequence
    of a bottleneck map, with the reference's extra Q/K/V/O linear projections
    around the core MHA (unet_cnns.py:107-159).

    Input/output: NHWC map ``(B, H, W, E)``. ``attn_mode`` selects the faithful
    cross-batch attention or intended token attention (see ops.attention).
    """

    embed_dim: int
    num_heads: int = 8
    mlp_dim: int = 512
    p_dropout: float = 0.2
    pos_encoding: Optional[str] = None
    attn_mode: str = "cross_batch"
    max_len: int = 600

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, e = x.shape
        tokens = x.reshape(b, h * w, e)

        if self.pos_encoding == "sinusoidal":
            # the sinusoidal table is analytic: extend past the reference's
            # max_len=600 when dense whole-recording inference yields more
            # tokens (identical values for the first 600 either way)
            pe = jnp.asarray(sinusoidal_positional_encoding(
                max(self.max_len, tokens.shape[1]), e))
            tokens = tokens + pe[: tokens.shape[1]]
            tokens = nn.Dropout(self.p_dropout)(tokens, deterministic=not train)
        elif self.pos_encoding == "learnable":
            pe = self.param(
                "pe",
                nn.initializers.kaiming_uniform(),
                (self.max_len, e),
            )
            tokens = tokens + pe[: tokens.shape[1]]
            tokens = nn.Dropout(self.p_dropout)(tokens, deterministic=not train)

        q = nn.Dense(e, use_bias=False, name="q_linear")(tokens)
        k = nn.Dense(e, use_bias=False, name="k_linear")(tokens)
        v = nn.Dense(e, use_bias=False, name="v_linear")(tokens)
        attn_out = TorchMultiheadAttention(
            embed_dim=e, num_heads=self.num_heads, mode=self.attn_mode, name="attn"
        )(q, k, v)
        attn_out = nn.Dense(e, use_bias=False, name="o_linear")(attn_out)
        attn_out = nn.Dropout(self.p_dropout)(attn_out, deterministic=not train)
        x1 = nn.LayerNorm(epsilon=1e-5, name="layernorm1")(tokens + attn_out)

        m = nn.Dense(self.mlp_dim, name="mlp1")(x1)
        m = nn.relu(m)
        m = nn.Dense(e, name="mlp2")(m)
        m = nn.Dropout(self.p_dropout)(m, deterministic=not train)
        x2 = nn.LayerNorm(epsilon=1e-5, name="layernorm2")(x1 + m)
        return x2.reshape(b, h, w, e)


class TransformerTemporalEncLayer(nn.Module):
    """Attention over the time axis only: (channel x freq) flattened into the
    embedding (unet_cnns.py:162-217). Input NHWC ``(B, T, F, C)`` with
    ``F * C == embed_dim``; tokens are the T time steps."""

    embed_dim: int
    num_heads: int = 8
    mlp_dim: int = 512
    p_dropout: float = 0.2
    pos_encoding: Optional[str] = None
    attn_mode: str = "cross_batch"
    max_len: int = 174

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, f, c = x.shape
        e = self.embed_dim
        # Reference flattens (C, F) into the embedding: token t has features
        # ordered channel-major (c, f) — match that ordering exactly.
        tokens = x.transpose(0, 1, 3, 2).reshape(b, t, c * f)

        if self.pos_encoding == "sinusoidal":
            pe = jnp.asarray(sinusoidal_positional_encoding(self.max_len, e))
            tokens = tokens + pe[:t]
            tokens = nn.Dropout(self.p_dropout)(tokens, deterministic=not train)
        elif self.pos_encoding == "learnable":
            pe = self.param("pe", nn.initializers.kaiming_uniform(), (self.max_len, e))
            tokens = tokens + pe[:t]
            tokens = nn.Dropout(self.p_dropout)(tokens, deterministic=not train)

        q = nn.Dense(e, use_bias=False, name="q_linear")(tokens)
        k = nn.Dense(e, use_bias=False, name="k_linear")(tokens)
        v = nn.Dense(e, use_bias=False, name="v_linear")(tokens)
        attn_out = TorchMultiheadAttention(
            embed_dim=e, num_heads=self.num_heads, mode=self.attn_mode, name="attn"
        )(q, k, v)
        attn_out = nn.Dense(e, use_bias=False, name="o_linear")(attn_out)
        attn_out = nn.Dropout(self.p_dropout)(attn_out, deterministic=not train)
        x1 = nn.LayerNorm(epsilon=1e-5, name="layernorm1")(tokens + attn_out)

        m = nn.Dense(self.mlp_dim, name="mlp1")(x1)
        m = nn.relu(m)
        m = nn.Dense(e, name="mlp2")(m)
        m = nn.Dropout(self.p_dropout)(m, deterministic=not train)
        x2 = nn.LayerNorm(epsilon=1e-5, name="layernorm2")(x1 + m)

        out = x2.reshape(b, t, c, f).transpose(0, 1, 3, 2)
        return out


class BLSTMTemporalEncLayer(nn.Module):
    """BLSTM over time with (channel x freq) flattened features
    (unet_cnns.py:220-243). Requires ``2 * hidden_size == F * C`` so the
    output reshapes back onto the map."""

    embed_dim: int
    hidden_size: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, f, c = x.shape
        tokens = x.transpose(0, 1, 3, 2).reshape(b, t, c * f)
        out = TorchLSTM(
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            bidirectional=True,
            name="blstm",
        )(tokens)
        # Reference views the (B, T, 2H) output as (B, C', F, T) with
        # C' = embed_dim // F — i.e. the 2H features are split channel-major.
        c_out = (2 * self.hidden_size) // f
        return out.reshape(b, t, c_out, f).transpose(0, 1, 3, 2)


class PitchHead(nn.Module):
    """The shared conv2/conv3/conv4 output head of every model in the zoo
    (basic_cnns.py:168-188 and all U-Net classes):

    - conv2 "binning to MIDI pitches": 3x3, stride (1,3) in freq, 216 -> 72,
      + MaxPool(13,1)s1p(6,0) + dropout;
    - conv3 "time reduction": kernel (75,1) collapsing the context window;
    - conv4: 1x1 conv, then (1, last_kernel) conv + Sigmoid.

    Returns NHWC (B, T-74, n_bins_out, 1).
    """

    n_chan_layers: Sequence[int]  # [_, n1, n2, n3]
    n_bins_in: int = 216
    n_bins_out: int = 72
    a_lrelu: float = 0.3
    p_dropout: float = 0.2
    context: int = 75

    @nn.compact
    def __call__(self, x, train: bool = False):
        n_ch = self.n_chan_layers
        last_kernel_size = self.n_bins_in // 3 + 1 - self.n_bins_out
        x = ConvBlock(
            n_ch[1], (3, 3), stride=(1, 3), padding=(1, 0),
            a_lrelu=self.a_lrelu, p_dropout=self.p_dropout,
            pool_kernel=(13, 1), pool_stride=(1, 1), pool_padding=(6, 0),
            name="conv2",
        )(x, train)
        x = ConvBlock(
            n_ch[2], (self.context, 1), padding=(0, 0),
            a_lrelu=self.a_lrelu, p_dropout=self.p_dropout,
            name="conv3",
        )(x, train)
        x = ConvBlock(
            n_ch[3], (1, 1), padding=(0, 0),
            a_lrelu=self.a_lrelu, p_dropout=self.p_dropout,
            name="conv4",
        )(x, train)
        x = nn.Conv(1, kernel_size=(1, last_kernel_size), padding="VALID",
                    name="conv5")(x)
        return jax.nn.sigmoid(x)
