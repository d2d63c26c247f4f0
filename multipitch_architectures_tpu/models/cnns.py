"""The basic/deep CNN family — flax re-implementations of the six classes in
the reference's libdl/nn_models/basic_cnns.py.

Public API mirrors the reference: inputs are ``(B, harmonics, T, F)`` (NCHW,
as the torch models take) and outputs are NCHW as well, e.g.
``(B, 1, T-74, n_bins_out)`` for the segm models (``(B,1,1,72)`` for a
75-frame window). Internally everything is NHWC for TPU conv efficiency.

Because every op is stride-1 in time, the "segm" models are fully
convolutional in time: feeding a whole padded recording yields all framewise
predictions in ONE pass (~75x fewer FLOPs than the reference's stride-1
sliding-window DataLoader loop, exp180d...py:427-443). NB the dense pass
sees true neighboring frames where the windowed protocol zero-pads each
window's time edges, so it is a fast mode, not a bit-parity mode — see
eval/inference.py.
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import ConvBlock, HarmonicLayerNorm, PitchHead


def _to_nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def _to_nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))


class BasicCnn(nn.Module):
    """Reference ``basic_cnn`` (basic_cnns.py:5-65): strided time
    downsampling variant for exactly 75(-1) context frames, sigmoid head."""

    n_chan_input: int = 6
    n_chan_layers: Sequence[int] = (20, 20, 10, 1)
    n_bins_in: int = 216
    n_bins_out: int = 12
    a_lrelu: float = 0.3
    p_dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        n_ch = self.n_chan_layers
        last_kernel_size = self.n_bins_in // 3 + 1 - self.n_bins_out
        x = _to_nhwc(x)
        x = HarmonicLayerNorm(name="layernorm")(x)
        x = ConvBlock(n_ch[0], (15, 15), padding=(7, 7),
                      a_lrelu=self.a_lrelu, p_dropout=self.p_dropout,
                      pool_kernel=(2, 1), pool_stride=(2, 1), name="conv1")(x, train)
        x = ConvBlock(n_ch[1], (3, 3), stride=(3, 3), padding=(0, 0),
                      a_lrelu=self.a_lrelu, p_dropout=self.p_dropout,
                      pool_kernel=(2, 1), pool_stride=(2, 1), name="conv2")(x, train)
        x = ConvBlock(n_ch[2], (6, 1), padding=(0, 0),
                      a_lrelu=self.a_lrelu, p_dropout=self.p_dropout,
                      name="conv3")(x, train)
        x = ConvBlock(n_ch[3], (1, 1), padding=(0, 0),
                      a_lrelu=self.a_lrelu, p_dropout=self.p_dropout,
                      name="conv4")(x, train)
        x = nn.Conv(1, kernel_size=(1, last_kernel_size), padding="VALID",
                    name="conv5")(x)
        return _to_nchw(jax.nn.sigmoid(x))


class BasicCnnPool(nn.Module):
    """Reference ``basic_cnn_pool`` (basic_cnns.py:68-130): max-pool instead
    of stride for better time shift-invariance."""

    n_chan_input: int = 6
    n_chan_layers: Sequence[int] = (20, 20, 10, 1)
    n_bins_in: int = 216
    n_bins_out: int = 12
    a_lrelu: float = 0.3
    p_dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        n_ch = self.n_chan_layers
        last_kernel_size = self.n_bins_in // 3 + 1 - self.n_bins_out
        x = _to_nhwc(x)
        x = HarmonicLayerNorm(name="layernorm")(x)
        x = ConvBlock(n_ch[0], (15, 15), padding=(7, 7),
                      a_lrelu=self.a_lrelu, p_dropout=self.p_dropout,
                      pool_kernel=(8, 1), pool_stride=(8, 1), name="conv1")(x, train)
        x = ConvBlock(n_ch[1], (3, 3), padding=(1, 1),
                      a_lrelu=self.a_lrelu, p_dropout=self.p_dropout,
                      pool_kernel=(3, 3), pool_stride=(3, 3), name="conv2")(x, train)
        x = ConvBlock(n_ch[2], (3, 1), padding=(0, 0),
                      a_lrelu=self.a_lrelu, p_dropout=self.p_dropout,
                      name="conv3")(x, train)
        x = ConvBlock(n_ch[3], (1, 1), padding=(0, 0),
                      a_lrelu=self.a_lrelu, p_dropout=self.p_dropout,
                      name="conv4")(x, train)
        x = nn.Conv(1, kernel_size=(1, last_kernel_size), padding="VALID",
                    name="conv5")(x)
        return _to_nchw(jax.nn.sigmoid(x))


class _SegmTrunk(nn.Module):
    """LayerNorm + conv1 prefilter shared by the segm CNNs
    (basic_cnns.py:159-167)."""

    n_chan: int
    a_lrelu: float
    p_dropout: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = HarmonicLayerNorm(name="layernorm")(x)
        x = ConvBlock(self.n_chan, (15, 15), padding=(7, 7),
                      a_lrelu=self.a_lrelu, p_dropout=self.p_dropout,
                      pool_kernel=(3, 1), pool_stride=(1, 1), pool_padding=(1, 0),
                      name="conv1")(x, train)
        return x


class BasicCnnSegmSigmoid(nn.Module):
    """Reference ``basic_cnn_segm_sigmoid`` (basic_cnns.py:133-195) —
    the paper's CNN:XS..L. Stride-1 in time; sigmoid pitch-salience head."""

    n_chan_input: int = 6
    n_chan_layers: Sequence[int] = (20, 20, 10, 1)
    n_bins_in: int = 216
    n_bins_out: int = 12
    a_lrelu: float = 0.3
    p_dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _to_nhwc(x)
        x = _SegmTrunk(self.n_chan_layers[0], self.a_lrelu, self.p_dropout,
                       name="trunk")(x, train)
        x = PitchHead(self.n_chan_layers, self.n_bins_in, self.n_bins_out,
                      self.a_lrelu, self.p_dropout, name="head")(x, train)
        return _to_nchw(x)


class BasicCnnSegmLogSoftmax(nn.Module):
    """Reference ``basic_cnn_segm_logsoftmax`` (basic_cnns.py:198-264):
    ``n_ch_out`` output channels with LogSoftmax over the channel dim
    (for CTC-style losses)."""

    n_chan_input: int = 6
    n_chan_layers: Sequence[int] = (20, 20, 10, 1)
    n_ch_out: int = 2
    n_bins_in: int = 216
    n_bins_out: int = 12
    a_lrelu: float = 0.3
    p_dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        n_ch = self.n_chan_layers
        last_kernel_size = self.n_bins_in // 3 + 1 - self.n_bins_out
        x = _to_nhwc(x)
        x = _SegmTrunk(n_ch[0], self.a_lrelu, self.p_dropout, name="trunk")(x, train)
        x = ConvBlock(n_ch[1], (3, 3), stride=(1, 3), padding=(1, 0),
                      a_lrelu=self.a_lrelu, p_dropout=self.p_dropout,
                      pool_kernel=(13, 1), pool_stride=(1, 1), pool_padding=(6, 0),
                      name="conv2")(x, train)
        x = ConvBlock(n_ch[2], (75, 1), padding=(0, 0),
                      a_lrelu=self.a_lrelu, p_dropout=self.p_dropout,
                      name="conv3")(x, train)
        x = ConvBlock(n_ch[3], (1, 1), padding=(0, 0),
                      a_lrelu=self.a_lrelu, p_dropout=self.p_dropout,
                      name="conv4")(x, train)
        x = nn.Conv(self.n_ch_out, kernel_size=(1, last_kernel_size),
                    padding="VALID", name="conv5")(x)
        return jax.nn.log_softmax(_to_nchw(x), axis=1)


class BasicCnnSegmBlankLogSoftmax(nn.Module):
    """Reference ``basic_cnn_segm_blank_logsoftmax`` (basic_cnns.py:267-339):
    adds a blank-symbol bin via a second (1,72) conv concatenated *before*
    the pitch bins along the pitch dim (MCTC)."""

    n_chan_input: int = 6
    n_chan_layers: Sequence[int] = (20, 20, 10, 1)
    n_ch_out: int = 2
    n_bins_in: int = 216
    n_bins_out: int = 12
    a_lrelu: float = 0.3
    p_dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        n_ch = self.n_chan_layers
        last_kernel_size = self.n_bins_in // 3 + 1 - self.n_bins_out
        x = _to_nhwc(x)
        x = _SegmTrunk(n_ch[0], self.a_lrelu, self.p_dropout, name="trunk")(x, train)
        x = ConvBlock(n_ch[1], (3, 3), stride=(1, 3), padding=(1, 0),
                      a_lrelu=self.a_lrelu, p_dropout=self.p_dropout,
                      pool_kernel=(13, 1), pool_stride=(1, 1), pool_padding=(6, 0),
                      name="conv2")(x, train)
        x = ConvBlock(n_ch[2], (75, 1), padding=(0, 0),
                      a_lrelu=self.a_lrelu, p_dropout=self.p_dropout,
                      name="conv3")(x, train)
        x = ConvBlock(n_ch[3], (1, 1), padding=(0, 0),
                      a_lrelu=self.a_lrelu, p_dropout=self.p_dropout,
                      name="conv4")(x, train)
        pitch = nn.Conv(self.n_ch_out, kernel_size=(1, last_kernel_size),
                        padding="VALID", name="conv5a")(x)
        blank = nn.Conv(self.n_ch_out, kernel_size=(1, 72),
                        padding="VALID", name="conv5b")(x)
        stacked = jnp.concatenate([blank, pitch], axis=2)  # freq axis in NHWC
        return jax.nn.log_softmax(_to_nchw(stacked), axis=1)


class DeepCnnSegmSigmoid(nn.Module):
    """Reference ``deep_cnn_segm_sigmoid`` (basic_cnns.py:342-423) — the
    paper's DCNN (residual=False) / DRCNN (residual=True): ``n_prefilt_layers``
    repeated 15x15 prefilter conv blocks, optionally with identity residual
    connections."""

    n_chan_input: int = 6
    n_chan_layers: Sequence[int] = (20, 20, 10, 1)
    n_prefilt_layers: int = 1
    residual: bool = False
    n_bins_in: int = 216
    n_bins_out: int = 12
    a_lrelu: float = 0.3
    p_dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        n_ch = self.n_chan_layers
        x = _to_nhwc(x)
        x = _SegmTrunk(n_ch[0], self.a_lrelu, self.p_dropout, name="trunk")(x, train)
        for p in range(self.n_prefilt_layers - 1):
            h = ConvBlock(n_ch[0], (15, 15), padding=(7, 7),
                          a_lrelu=self.a_lrelu, p_dropout=self.p_dropout,
                          pool_kernel=(3, 1), pool_stride=(1, 1),
                          pool_padding=(1, 0), name=f"prefilt{p}")(x, train)
            x = x + h if self.residual else h
        x = PitchHead(n_ch, self.n_bins_in, self.n_bins_out,
                      self.a_lrelu, self.p_dropout, name="head")(x, train)
        return _to_nchw(x)
