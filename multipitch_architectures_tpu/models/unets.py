"""The U-Net model family — flax re-implementations of the 19 model classes in
the reference's libdl/nn_models/unet_cnns.py (plus working versions of the two
classes that are broken there).

Paper names (SURVEY.md §2.4 / §6):

- ``simple_u_net_largekernels``            → Unet   S/M/L/XL
- ``simple_u_net_doubleselfattn``          → SAUnet M/L/XL/XXL  (flagship)
- ``simple_u_net_doubleselfattn_twolayers``→ SAUSnet M/L/XL/XXL
- ``u_net_blstm_varlayers``                → BLUnet M/L/XXL
- ``simple_u_net_polyphony_classif_softmax``→ PUnet M/L/XL (multitask)

Public API mirrors the reference: NCHW ``(B, harmonics, T, F)`` in,
NCHW out (``(B,1,1,72)`` for a 75-frame window; ``(B,1,T-74,72)`` dense).
Internally NHWC ``(B, T, F, C)`` for TPU conv efficiency.

Unlike the stride-1-in-time CNN family, the U-Nets pool over time, so dense
whole-recording output is *not* bit-identical to the reference's stride-1
sliding-window protocol — use windowed batched inference for checkpoint
parity (eval pipeline) and the dense path as the fast TPU-native mode.
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import (
    BLSTMTemporalEncLayer,
    ConvBlock,
    DoubleConv,
    HarmonicLayerNorm,
    PitchHead,
    SingleConvSELU,
    TransformerEncLayer,
    TransformerTemporalEncLayer,
    max_pool2d,
    max_pool_with_indices_freq,
    max_unpool_freq,
)
from ..ops.resize import up_concat_pad


# ---------------------------------------------------------------------------
# Geometry helpers
# ---------------------------------------------------------------------------

def _std_geometry(sc: int, n_ch0: int, kernels=(15, 9, 5, 3)):
    """Channel/kernel ladder of the standard simple_u_net family
    (unet_cnns.py:347-369): enc widths 64..1024 / scalefac, dec mirrors.
    ``kernels=(3,3,3,3)`` gives the plain ``simple_u_net`` (:265-287)."""
    k1, k2, k3, k4 = [(k, k) for k in kernels]
    enc = [
        dict(out=64 // sc, mid=64 // sc, k=k1),
        dict(out=128 // sc, mid=128 // sc, k=k1),
        dict(out=256 // sc, mid=256 // sc, k=k2),
        dict(out=512 // sc, mid=512 // sc, k=k3),
        dict(out=1024 // (sc * 2), mid=1024 // (sc * 2), k=k4),
    ]
    dec = [
        dict(out=512 // (sc * 2), mid=1024 // (sc * 2), k=k4),
        dict(out=256 // (sc * 2), mid=512 // (sc * 2), k=k3),
        dict(out=128 // (sc * 2), mid=256 // (sc * 2), k=k2),
        dict(out=n_ch0, mid=128 // (sc * 2), k=k1),
    ]
    return enc, dec


def _temporal_geometry(sc: int, n_ch0: int):
    """The asymmetric-pooling ladder of u_net_temporal_* models
    (unet_cnns.py:1135-1189): 16/48/144/432/1728 channels, pool (2,3)."""
    enc = [
        dict(out=16 // sc, mid=16 // sc, k=(15, 15)),
        dict(out=48 // sc, mid=48 // sc, k=(15, 15)),
        dict(out=144 // sc, mid=144 // sc, k=(9, 9)),
        dict(out=432 // sc, mid=432 // sc, k=(5, 5)),
        dict(out=1728 // sc, mid=1728 // sc, k=(3, 3)),
    ]
    dec = [
        dict(out=144 // sc, mid=(1728 + 432) // (2 * sc), k=(3, 3)),
        dict(out=48 // sc, mid=144 // sc, k=(5, 5)),
        dict(out=16 // sc, mid=48 // sc, k=(9, 9)),
        dict(out=n_ch0, mid=48 // sc, k=(15, 15)),
    ]
    return enc, dec


def _pad(k):
    return (k[0] // 2, k[1] // 2)


def _encode(x, enc, pool, train, convdrop=0.0, residual=False, alt_order=False,
            inc_residual=False):
    """inc + down1..down4. Must be called inside an ``nn.compact`` context;
    submodules are named ``inc``/``down1``..``down4`` to match the porter.
    ``residual`` applies to down blocks only (reference never passes it to
    ``inc``, unet_cnns.py:510-525)."""
    skips = []
    h = DoubleConv(enc[0]["out"], enc[0]["mid"], enc[0]["k"], _pad(enc[0]["k"]),
                   convdrop=convdrop, residual=inc_residual, alt_order=alt_order,
                   name="inc")(x, train)
    skips.append(h)
    for i in range(1, 5):
        h = max_pool2d(h, pool)
        h = DoubleConv(enc[i]["out"], enc[i]["mid"], enc[i]["k"],
                       _pad(enc[i]["k"]), convdrop=convdrop, residual=residual,
                       alt_order=alt_order, name=f"down{i}")(h, train)
        skips.append(h)
    return skips  # [x1, x2, x3, x4, x5]


def _decode(x, skips, dec, upsamp, train, convdrop=0.0, residual=False,
            alt_order=False):
    """upconcat + upconv1..upconv4 against ``skips = [x4, x3, x2, x1]``."""
    for i, skip in enumerate(skips, start=1):
        x = up_concat_pad(x, skip, upsamp)
        x = DoubleConv(dec[i - 1]["out"], dec[i - 1]["mid"], dec[i - 1]["k"],
                       _pad(dec[i - 1]["k"]), convdrop=convdrop,
                       residual=residual, alt_order=alt_order,
                       name=f"upconv{i}")(x, train)
    return x


def _polyphony_head(x5, mid_channels, out_channels, a_lrelu, p_dropout, train,
                    relu_out):
    """Degree-of-polyphony head ``convP`` (unet_cnns.py:2040-2047, 2311-2318):
    conv(2,5) → lrelu → maxpool k(2,5) s(1,2) → dropout → conv(2,3) [→ relu].
    NHWC input (B, Tb, Fb, C); returns NHWC (B, Tb-3, F', out_channels).
    Submodules named convP1/convP2 to match the porter."""
    h = nn.Conv(mid_channels, kernel_size=(2, 5), padding="VALID",
                name="convP1")(x5)
    h = jax.nn.leaky_relu(h, a_lrelu)
    h = max_pool2d(h, (2, 5), stride=(1, 2))
    h = nn.Dropout(p_dropout)(h, deterministic=not train)
    h = nn.Conv(out_channels, kernel_size=(2, 3), padding="VALID",
                name="convP2")(h)
    if relu_out:
        h = nn.relu(h)
    return h


def _to_nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def _to_nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))


# ---------------------------------------------------------------------------
# Standard simple_u_net family
# ---------------------------------------------------------------------------

class _SimpleUNetCommon(nn.Module):
    """Shared fields of the simple_u_net* classes."""

    n_chan_input: int = 6
    n_chan_layers: Sequence[int] = (64, 30, 20, 10)
    n_bins_in: int = 216
    n_bins_out: int = 12
    a_lrelu: float = 0.3
    p_dropout: float = 0.2
    scalefac: int = 16

    def _head(self, x, train):
        return PitchHead(self.n_chan_layers, self.n_bins_in, self.n_bins_out,
                         self.a_lrelu, self.p_dropout, name="head")(x, train)


class SimpleUNet(_SimpleUNetCommon):
    """Reference ``simple_u_net`` (unet_cnns.py:251-325): 3x3 kernels at every
    level, scalefac default 8."""

    scalefac: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc, dec = _std_geometry(self.scalefac, self.n_chan_layers[0],
                                 kernels=(3, 3, 3, 3))
        x = HarmonicLayerNorm(name="layernorm")(_to_nhwc(x))
        x1, x2, x3, x4, x5 = _encode(x, enc, (2, 2), train)
        h = _decode(x5, [x4, x3, x2, x1], dec, (2, 2), train)
        return _to_nchw(self._head(h, train))


class SimpleUNetLargeKernels(_SimpleUNetCommon):
    """Reference ``simple_u_net_largekernels`` (unet_cnns.py:333-407) — the
    paper's **Unet S/M/L/XL**: kernel pyramid 15→9→5→3 down, mirrored up."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc, dec = _std_geometry(self.scalefac, self.n_chan_layers[0])
        x = HarmonicLayerNorm(name="layernorm")(_to_nhwc(x))
        x1, x2, x3, x4, x5 = _encode(x, enc, (2, 2), train)
        h = _decode(x5, [x4, x3, x2, x1], dec, (2, 2), train)
        return _to_nchw(self._head(h, train))


class SimpleUNetSelfAttn(_SimpleUNetCommon):
    """Reference ``simple_u_net_selfattn`` (unet_cnns.py:415-492): one
    transformer encoder layer at the bottleneck (module name ``attention``)."""

    embed_dim: int = 32
    num_heads: int = 8
    mlp_dim: int = 512
    attn_mode: str = "cross_batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc, dec = _std_geometry(self.scalefac, self.n_chan_layers[0])
        x = HarmonicLayerNorm(name="layernorm")(_to_nhwc(x))
        x1, x2, x3, x4, x5 = _encode(x, enc, (2, 2), train)
        x5 = TransformerEncLayer(self.embed_dim, self.num_heads, self.mlp_dim,
                                 attn_mode=self.attn_mode,
                                 name="attention")(x5, train)
        h = _decode(x5, [x4, x3, x2, x1], dec, (2, 2), train)
        return _to_nchw(self._head(h, train))


class SimpleUNetDoubleSelfAttn(_SimpleUNetCommon):
    """Reference ``simple_u_net_doubleselfattn`` (unet_cnns.py:496-575) — the
    paper's **SAUnet M/L/XL/XXL** (flagship, exp180*): two transformer
    encoder layers at the bottleneck, first optionally with positional
    encoding; double_conv options convdrop/residual/alt_order."""

    embed_dim: int = 32
    num_heads: int = 8
    mlp_dim: int = 512
    pos_encoding: Optional[str] = None
    convdrop: Optional[float] = 0.0
    residual: bool = False
    alt_order: bool = False
    attn_mode: str = "cross_batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc, dec = _std_geometry(self.scalefac, self.n_chan_layers[0])
        x = HarmonicLayerNorm(name="layernorm")(_to_nhwc(x))
        x1, x2, x3, x4, x5 = _encode(
            x, enc, (2, 2), train, convdrop=self.convdrop,
            residual=self.residual, alt_order=self.alt_order)
        attn = lambda name, pe: TransformerEncLayer(
            self.embed_dim, self.num_heads, self.mlp_dim,
            pos_encoding=pe, attn_mode=self.attn_mode, name=name)
        x5 = attn("attention1", self.pos_encoding)(x5, train)
        x5 = attn("attention2", None)(x5, train)
        h = _decode(x5, [x4, x3, x2, x1], dec, (2, 2), train,
                    convdrop=self.convdrop, residual=self.residual,
                    alt_order=self.alt_order)
        return _to_nchw(self._head(h, train))


class SimpleUNetSixSelfAttn(_SimpleUNetCommon):
    """Reference ``simple_u_net_sixselfattn`` (unet_cnns.py:579-666): six
    stacked bottleneck transformer layers."""

    embed_dim: int = 32
    num_heads: int = 8
    mlp_dim: int = 512
    pos_encoding: Optional[str] = None
    attn_mode: str = "cross_batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc, dec = _std_geometry(self.scalefac, self.n_chan_layers[0])
        x = HarmonicLayerNorm(name="layernorm")(_to_nhwc(x))
        x1, x2, x3, x4, x5 = _encode(x, enc, (2, 2), train)
        for i in range(1, 7):
            pe = self.pos_encoding if i == 1 else None
            x5 = TransformerEncLayer(
                self.embed_dim, self.num_heads, self.mlp_dim, pos_encoding=pe,
                attn_mode=self.attn_mode, name=f"attention{i}")(x5, train)
        h = _decode(x5, [x4, x3, x2, x1], dec, (2, 2), train)
        return _to_nchw(self._head(h, train))


class SimpleUNetDoubleSelfAttnTwoLayers(_SimpleUNetCommon):
    """Reference ``simple_u_net_doubleselfattn_twolayers``
    (unet_cnns.py:670-754) — the paper's **SAUSnet M/L/XL/XXL** (exp181*):
    two attention layers at the bottleneck (attention1/2) AND two on the
    deepest skip x4 (attention3/4; attention3 also gets pos_encoding)."""

    embed_dim: int = 32
    num_heads: int = 8
    mlp_dim: int = 512
    pos_encoding: Optional[str] = None
    convdrop: Optional[float] = 0.0
    residual: bool = False
    attn_mode: str = "cross_batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc, dec = _std_geometry(self.scalefac, self.n_chan_layers[0])
        x = HarmonicLayerNorm(name="layernorm")(_to_nhwc(x))
        x1, x2, x3, x4, x5 = _encode(x, enc, (2, 2), train,
                                     convdrop=self.convdrop,
                                     residual=self.residual)
        attn = lambda name, pe: TransformerEncLayer(
            self.embed_dim, self.num_heads, self.mlp_dim, self.p_dropout,
            pos_encoding=pe, attn_mode=self.attn_mode, name=name)
        x5 = attn("attention1", self.pos_encoding)(x5, train)
        x5 = attn("attention2", None)(x5, train)
        x4 = attn("attention3", self.pos_encoding)(x4, train)
        x4 = attn("attention4", None)(x4, train)
        h = _decode(x5, [x4, x3, x2, x1], dec, (2, 2), train,
                    convdrop=self.convdrop, residual=self.residual)
        return _to_nchw(self._head(h, train))


class SimpleUNetDoubleSelfAttnVarLayers(_SimpleUNetCommon):
    """Reference ``simple_u_net_doubleselfattn_varlayers``
    (unet_cnns.py:863-994): attention on the ``self_attn_depth`` deepest
    levels (5 → 1), ``self_attn_number`` ∈ {0,1,2} layers per level, embed_dim
    halved per level above level 4. ``simple_u_net_doubleselfattn_alllayers``
    (:758-857) equals depth=5/number=2 with letter naming (see porter)."""

    embed_dim: int = 64
    num_heads: int = 8
    mlp_dim: int = 512
    self_attn_depth: int = 0
    self_attn_number: int = 2
    pos_encoding: Optional[str] = None
    scalefac: int = 8
    attn_mode: str = "cross_batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc, dec = _std_geometry(self.scalefac, self.n_chan_layers[0])
        x = HarmonicLayerNorm(name="layernorm")(_to_nhwc(x))
        x1, x2, x3, x4, x5 = _encode(x, enc, (2, 2), train)
        # embed dims per level: 5 & 4 use embed_dim, then /2 per level up
        dims = {5: self.embed_dim, 4: self.embed_dim, 3: self.embed_dim // 2,
                2: self.embed_dim // 4, 1: self.embed_dim // 8}

        def process(h, level):
            depth_needed = 6 - level  # level 5 needs depth>0, level 4 depth>1 ...
            if self.self_attn_depth < depth_needed:
                return h
            for j, letter in zip(range(self.self_attn_number), "ab"):
                pe = self.pos_encoding if letter == "a" else None
                h = TransformerEncLayer(
                    dims[level], self.num_heads, self.mlp_dim, self.p_dropout,
                    pos_encoding=pe, attn_mode=self.attn_mode,
                    name=f"attention{level}{letter}")(h, train)
            return h

        x5 = process(x5, 5)
        x4 = process(x4, 4)
        h = up_concat_pad(x5, x4, (2, 2))
        h = DoubleConv(dec[0]["out"], dec[0]["mid"], dec[0]["k"],
                       _pad(dec[0]["k"]), name="upconv1")(h, train)
        x3 = process(x3, 3)
        h = up_concat_pad(h, x3, (2, 2))
        h = DoubleConv(dec[1]["out"], dec[1]["mid"], dec[1]["k"],
                       _pad(dec[1]["k"]), name="upconv2")(h, train)
        x2 = process(x2, 2)
        h = up_concat_pad(h, x2, (2, 2))
        h = DoubleConv(dec[2]["out"], dec[2]["mid"], dec[2]["k"],
                       _pad(dec[2]["k"]), name="upconv3")(h, train)
        x1 = process(x1, 1)
        h = up_concat_pad(h, x1, (2, 2))
        h = DoubleConv(dec[3]["out"], dec[3]["mid"], dec[3]["k"],
                       _pad(dec[3]["k"]), name="upconv4")(h, train)
        return _to_nchw(self._head(h, train))


class SimpleUNetDoubleSelfAttnAllLayers(SimpleUNetDoubleSelfAttnVarLayers):
    """Reference ``simple_u_net_doubleselfattn_alllayers``
    (unet_cnns.py:758-857): two attention layers on *every* skip level —
    structurally identical to varlayers with depth=5/number=2 and no
    positional encoding (verified block-by-block against :790-803)."""

    self_attn_depth: int = 5
    self_attn_number: int = 2


class UNetBlstmVarLayers(_SimpleUNetCommon):
    """Reference ``u_net_blstm_varlayers`` (unet_cnns.py:1000-1101) — the
    paper's **BLUnet M/L/XXL** (exp186*): BLSTM stacks (``lstm5``..``lstm1``)
    replacing attention on the ``lstm_depth`` deepest levels."""

    embed_dim: int = 64
    hidden_size: int = 512
    lstm_depth: int = 0
    lstm_number: int = 2
    scalefac: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc, dec = _std_geometry(self.scalefac, self.n_chan_layers[0])
        x = HarmonicLayerNorm(name="layernorm")(_to_nhwc(x))
        x1, x2, x3, x4, x5 = _encode(x, enc, (2, 2), train)

        def process(h, level):
            if self.lstm_depth < 6 - level:
                return h
            return BLSTMTemporalEncLayer(
                self.embed_dim, self.hidden_size, self.lstm_number,
                name=f"lstm{level}")(h, train)

        x5 = process(x5, 5)
        x4 = process(x4, 4)
        h = up_concat_pad(x5, x4, (2, 2))
        h = DoubleConv(dec[0]["out"], dec[0]["mid"], dec[0]["k"],
                       _pad(dec[0]["k"]), name="upconv1")(h, train)
        x3 = process(x3, 3)
        h = up_concat_pad(h, x3, (2, 2))
        h = DoubleConv(dec[1]["out"], dec[1]["mid"], dec[1]["k"],
                       _pad(dec[1]["k"]), name="upconv2")(h, train)
        x2 = process(x2, 2)
        h = up_concat_pad(h, x2, (2, 2))
        h = DoubleConv(dec[2]["out"], dec[2]["mid"], dec[2]["k"],
                       _pad(dec[2]["k"]), name="upconv3")(h, train)
        x1 = process(x1, 1)
        h = up_concat_pad(h, x1, (2, 2))
        h = DoubleConv(dec[3]["out"], dec[3]["mid"], dec[3]["k"],
                       _pad(dec[3]["k"]), name="upconv4")(h, train)
        return _to_nchw(self._head(h, train))


# ---------------------------------------------------------------------------
# Temporal (asymmetric-pooling) U-Nets
# ---------------------------------------------------------------------------

class _TemporalUNetCommon(_SimpleUNetCommon):
    scalefac: int = 8

    def _temporal_unet(self, x, train, process):
        enc, dec = _temporal_geometry(self.scalefac, self.n_chan_layers[0])
        x = HarmonicLayerNorm(name="layernorm")(_to_nhwc(x))
        x1, x2, x3, x4, x5 = _encode(x, enc, (2, 3), train)
        x5 = process(x5, 5)
        x4 = process(x4, 4)
        h = up_concat_pad(x5, x4, (2, 3))
        h = DoubleConv(dec[0]["out"], dec[0]["mid"], dec[0]["k"],
                       _pad(dec[0]["k"]), name="upconv1")(h, train)
        x3 = process(x3, 3)
        h = up_concat_pad(h, x3, (2, 3))
        h = DoubleConv(dec[1]["out"], dec[1]["mid"], dec[1]["k"],
                       _pad(dec[1]["k"]), name="upconv2")(h, train)
        x2 = process(x2, 2)
        h = up_concat_pad(h, x2, (2, 3))
        h = DoubleConv(dec[2]["out"], dec[2]["mid"], dec[2]["k"],
                       _pad(dec[2]["k"]), name="upconv3")(h, train)
        x1 = process(x1, 1)
        h = up_concat_pad(h, x1, (2, 3))
        h = DoubleConv(dec[3]["out"], dec[3]["mid"], dec[3]["k"],
                       _pad(dec[3]["k"]), name="upconv4")(h, train)
        return _to_nchw(self._head(h, train))


class UNetTemporalSelfAttnVarLayers(_TemporalUNetCommon):
    """Reference ``u_net_temporal_selfattn_varlayers``
    (unet_cnns.py:1117-1252): attention over time only (freq×chan flattened
    into the embedding), asymmetric (2,3) pooling, 16..1728 channel ladder.
    Exists to avoid quadratic cost of full-map attention (:1108-1116)."""

    embed_dim: int = 64
    num_heads: int = 8
    mlp_dim: int = 512
    self_attn_depth: int = 0
    self_attn_number: int = 2
    pos_encoding: Optional[str] = None
    attn_mode: str = "cross_batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        def process(h, level):
            if self.self_attn_depth < 6 - level:
                return h
            for j, letter in zip(range(self.self_attn_number), "ab"):
                pe = self.pos_encoding if letter == "a" else None
                h = TransformerTemporalEncLayer(
                    self.embed_dim, self.num_heads, self.mlp_dim,
                    self.p_dropout, pos_encoding=pe, attn_mode=self.attn_mode,
                    name=f"attention{level}{letter}")(h, train)
            return h

        return self._temporal_unet(x, train, process)


class UNetTemporalBlstmVarLayers(_TemporalUNetCommon):
    """Reference ``u_net_temporal_blstm_varlayers`` (unet_cnns.py:1258-1364):
    the BLSTM version of the temporal U-Net."""

    embed_dim: int = 64
    hidden_size: int = 512
    lstm_depth: int = 0
    lstm_number: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        def process(h, level):
            if self.lstm_depth < 6 - level:
                return h
            return BLSTMTemporalEncLayer(
                self.embed_dim, self.hidden_size, self.lstm_number,
                name=f"lstm{level}")(h, train)

        return self._temporal_unet(x, train, process)


class SimpleUNetDoubleSelfAttnTransEnc(_SimpleUNetCommon):
    """Reference ``simple_u_net_doubleselfattn_transenc``
    (unet_cnns.py:1370-1526): varlayers-style skip attention plus a
    transformer-based time reduction replacing conv3/conv4 — two temporal
    encoder layers over the conv2 output, then a center crop of
    ``half_context`` frames each side and a 1x1 sigmoid reduction.

    The reference returns a 5-D tensor due to a stray ``unsqueeze(1)``
    (:1525); we return the evident intent, NCHW ``(B, 1, T-2*37, 72)``.
    """

    embed_dim: int = 64
    num_heads: int = 8
    mlp_dim: int = 512
    self_attn_depth: int = 0
    self_attn_number: int = 2
    time_embed_dim: int = 256
    pos_encoding: Optional[str] = None
    scalefac: int = 8
    attn_mode: str = "cross_batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc, dec = _std_geometry(self.scalefac, self.n_chan_layers[0])
        x = HarmonicLayerNorm(name="layernorm")(_to_nhwc(x))
        x1, x2, x3, x4, x5 = _encode(x, enc, (2, 2), train)
        dims = {5: self.embed_dim, 4: self.embed_dim, 3: self.embed_dim // 2,
                2: self.embed_dim // 4, 1: self.embed_dim // 8}

        def process(h, level):
            if self.self_attn_depth < 6 - level:
                return h
            for j, letter in zip(range(self.self_attn_number), "ab"):
                h = TransformerEncLayer(
                    dims[level], self.num_heads, self.mlp_dim, self.p_dropout,
                    attn_mode=self.attn_mode,
                    name=f"attention{level}{letter}")(h, train)
            return h

        x5 = process(x5, 5)
        x4 = process(x4, 4)
        h = up_concat_pad(x5, x4, (2, 2))
        h = DoubleConv(dec[0]["out"], dec[0]["mid"], dec[0]["k"],
                       _pad(dec[0]["k"]), name="upconv1")(h, train)
        x3 = process(x3, 3)
        h = up_concat_pad(h, x3, (2, 2))
        h = DoubleConv(dec[1]["out"], dec[1]["mid"], dec[1]["k"],
                       _pad(dec[1]["k"]), name="upconv2")(h, train)
        x2 = process(x2, 2)
        h = up_concat_pad(h, x2, (2, 2))
        h = DoubleConv(dec[2]["out"], dec[2]["mid"], dec[2]["k"],
                       _pad(dec[2]["k"]), name="upconv3")(h, train)
        x1 = process(x1, 1)
        h = up_concat_pad(h, x1, (2, 2))
        h = DoubleConv(dec[3]["out"], dec[3]["mid"], dec[3]["k"],
                       _pad(dec[3]["k"]), name="upconv4")(h, train)

        # conv2 of the standard head (binning to 72 pitch bins)
        h = ConvBlock(self.n_chan_layers[1], (3, 3), stride=(1, 3),
                      padding=(1, 0), a_lrelu=self.a_lrelu,
                      p_dropout=self.p_dropout, pool_kernel=(13, 1),
                      pool_stride=(1, 1), pool_padding=(6, 0),
                      name="conv2")(h, train)
        # Temporal transformer time reduction. The reference transposes
        # channels<->freq before the temporal layer (:1516), making the
        # token features freq-major over channels; swapping the (F, C) axes
        # of our NHWC map reproduces that ordering exactly.
        h = h.transpose(0, 1, 3, 2)
        h = TransformerTemporalEncLayer(
            self.time_embed_dim, self.num_heads, self.mlp_dim, self.p_dropout,
            pos_encoding=self.pos_encoding, attn_mode=self.attn_mode,
            name="attention_time1")(h, train)
        h = TransformerTemporalEncLayer(
            self.time_embed_dim, self.num_heads, self.mlp_dim, self.p_dropout,
            attn_mode=self.attn_mode, name="attention_time2")(h, train)
        h = h.transpose(0, 1, 3, 2)
        half_context = 75 // 2
        h = h[:, half_context:-half_context]
        h = nn.Conv(1, kernel_size=(1, 1), padding="VALID", name="reduction")(h)
        return _to_nchw(jax.nn.sigmoid(h))


# ---------------------------------------------------------------------------
# Frequency U-Nets (pool over freq only, MaxUnpool with indices)
# ---------------------------------------------------------------------------

class _BNConvSELU(nn.Module):
    """torch ``Sequential(BatchNorm2d, Conv2d, SELU)`` used by the
    freq_u_net_*selfattn variants (unet_cnns.py:1715-1726)."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    padding: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        x = nn.Conv(self.features, kernel_size=self.kernel,
                    padding=((self.padding[0], self.padding[0]),
                             (self.padding[1], self.padding[1])),
                    name="conv")(x)
        return jax.nn.selu(x)


class FreqUNet(nn.Module):
    """Reference ``freq_u_net`` (unet_cnns.py:1539-1603): freq-only pooling
    (factors 3/4/6) with MaxUnpool index transfer. The reference class is
    unconstructible (``single_conv_SELU`` undefined, :1558); this is the
    working equivalent of its evident intent via :class:`SingleConvSELU`."""

    n_chan_input: int = 6
    n_chan_layers: Sequence[int] = (32, 30, 20, 10)
    n_bins_in: int = 216
    n_bins_out: int = 12
    a_lrelu: float = 0.3
    p_dropout: float = 0.2
    scalefac: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        sc = self.scalefac
        n_ch = self.n_chan_layers
        x = HarmonicLayerNorm(name="layernorm")(_to_nhwc(x))
        c1 = SingleConvSELU(32 // sc, (5, 5), (2, 2), name="down_conv1")(x)
        c1, ind1 = max_pool_with_indices_freq(c1, 3)
        c2 = SingleConvSELU(64 // sc, (5, 5), (2, 2), name="down_conv2")(c1)
        c2, ind2 = max_pool_with_indices_freq(c2, 4)
        c3 = SingleConvSELU(128 // sc, (3, 3), (1, 1), name="down_conv3")(c2)
        c3, ind3 = max_pool_with_indices_freq(c3, 6)
        u3 = SingleConvSELU(64 // sc, (3, 3), (1, 1),
                            name="up_conv3")(max_unpool_freq(c3, ind3, 6))
        u2 = SingleConvSELU(32 // sc, (5, 5), (2, 2),
                            name="up_conv2")(max_unpool_freq(u3, ind2, 4))
        u1 = SingleConvSELU(n_ch[0] // sc, (5, 5), (2, 2),
                            name="up_conv1")(max_unpool_freq(u2, ind1, 3))
        head = PitchHead(n_ch, self.n_bins_in, self.n_bins_out, self.a_lrelu,
                         self.p_dropout, name="head")(u1, train)
        return _to_nchw(head)


class FreqUNetBottomStack(nn.Module):
    """Reference ``freq_u_net_bottomstack`` (unet_cnns.py:1609-1684, broken
    upstream like :class:`FreqUNet`): adds a bottom non-pitch activity row,
    time-reduced by ``conv3b`` and concatenated after the pitch bins →
    output NCHW (B, 1, T', n_bins_out+1)."""

    n_chan_input: int = 6
    n_chan_layers: Sequence[int] = (32, 30, 20, 10)
    n_bins_in: int = 216
    n_bins_out: int = 12
    a_lrelu: float = 0.3
    p_dropout: float = 0.2
    scalefac: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        sc = self.scalefac
        n_ch = self.n_chan_layers
        x = HarmonicLayerNorm(name="layernorm")(_to_nhwc(x))
        c1 = SingleConvSELU(32 // sc, (5, 5), (2, 2), name="down_conv1")(x)
        c1, ind1 = max_pool_with_indices_freq(c1, 3)
        c2 = SingleConvSELU(64 // sc, (5, 5), (2, 2), name="down_conv2")(c1)
        c2, ind2 = max_pool_with_indices_freq(c2, 4)
        c3 = SingleConvSELU(128 // sc, (3, 3), (1, 1), name="down_conv3")(c2)
        c3, ind3 = max_pool_with_indices_freq(c3, 6)
        bm = SingleConvSELU(1, (3, 3), (1, 0), name="bottom")(c3)
        u3 = SingleConvSELU(64 // sc, (3, 3), (1, 1),
                            name="up_conv3")(max_unpool_freq(c3, ind3, 6))
        u2 = SingleConvSELU(32 // sc, (5, 5), (2, 2),
                            name="up_conv2")(max_unpool_freq(u3, ind2, 4))
        u1 = SingleConvSELU(n_ch[0] // sc, (5, 5), (2, 2),
                            name="up_conv1")(max_unpool_freq(u2, ind1, 3))
        head = PitchHead(n_ch, self.n_bins_in, self.n_bins_out, self.a_lrelu,
                         self.p_dropout, name="head")(u1, train)
        # Activity row: (75,1) time reduction + LeakyReLU + Sigmoid
        # (reference conv3b, :1656-1660).
        bm = nn.Conv(1, kernel_size=(75, 1), padding="VALID", name="conv3b")(bm)
        bm = jax.nn.sigmoid(jax.nn.leaky_relu(bm, self.a_lrelu))
        return _to_nchw(jnp.concatenate([head, bm], axis=2))


class _FreqAttnBlock(nn.Module):
    """The inline post-norm attention block of the freq_u_net_*selfattn
    variants (unet_cnns.py:1730-1746): project C→embed for Q/K/V, MHA,
    project back embed→C, residual + LayerNorm, MLP, residual + LayerNorm.
    Param names (q_linear, ..., layernorm5/6 or 7/8) follow the reference."""

    channels: int
    embed_dim: int
    num_heads: int
    mlp_dim: int
    p_dropout: float
    suffix: str = ""        # "" for block 1, "2" for block 2
    ln_ids: Tuple[int, int] = (5, 6)
    attn_mode: str = "cross_batch"

    @nn.compact
    def __call__(self, tokens, train: bool = False):
        from ..ops.attention import TorchMultiheadAttention

        s = self.suffix
        i, j = self.ln_ids
        q = nn.Dense(self.embed_dim, use_bias=False, name=f"q_linear{s}")(tokens)
        k = nn.Dense(self.embed_dim, use_bias=False, name=f"k_linear{s}")(tokens)
        v = nn.Dense(self.embed_dim, use_bias=False, name=f"v_linear{s}")(tokens)
        a = TorchMultiheadAttention(self.embed_dim, self.num_heads,
                                    mode=self.attn_mode, name=f"attn{s}")(q, k, v)
        a = nn.Dense(self.channels, use_bias=False, name=f"o_linear{s}")(a)
        a = nn.Dropout(self.p_dropout)(a, deterministic=not train)
        h = nn.LayerNorm(epsilon=1e-5, name=f"layernorm{i}")(tokens + a)
        m = nn.Dense(self.mlp_dim, name=f"mlp{j}_1")(h)
        m = nn.relu(m)
        m = nn.Dense(self.channels, name=f"mlp{j}_2")(m)
        m = nn.Dropout(self.p_dropout)(m, deterministic=not train)
        return nn.LayerNorm(epsilon=1e-5, name=f"layernorm{j}")(h + m)


class FreqUNetSelfAttn(nn.Module):
    """Reference ``freq_u_net_selfattn`` (unet_cnns.py:1691-1813): freq-pooled
    (3/8/9) BN-conv-SELU U-Net with one inline attention block over the time
    tokens at the fully-freq-pooled bottleneck."""

    n_chan_input: int = 6
    n_chan_layers: Sequence[int] = (32, 30, 20, 10)
    n_bins_in: int = 216
    n_bins_out: int = 72
    a_lrelu: float = 0.3
    p_dropout: float = 0.2
    scalefac: int = 1
    embed_dim: int = 64
    num_heads: int = 8
    mlp_dim: int = 512
    attn_mode: str = "cross_batch"

    def _attn_blocks(self, tokens, train):
        return _FreqAttnBlock(
            int(128 / self.scalefac), self.embed_dim, self.num_heads,
            self.mlp_dim, self.p_dropout, attn_mode=self.attn_mode,
            name="attnblock1")(tokens, train)

    @nn.compact
    def __call__(self, x, train: bool = False):
        sc = self.scalefac
        n_ch = self.n_chan_layers
        x = HarmonicLayerNorm(name="layernorm")(_to_nhwc(x))
        c1 = SingleConvSELU(int(32 / sc), (5, 5), (2, 2), name="conv1")(x)
        c1, ind1 = max_pool_with_indices_freq(c1, 3)
        c2 = _BNConvSELU(int(64 / sc), (5, 5), (2, 2), name="conv2")(c1, train)
        c2, ind2 = max_pool_with_indices_freq(c2, 8)
        c3 = _BNConvSELU(int(128 / sc), (3, 3), (1, 1), name="conv3")(c2, train)
        c3, ind3 = max_pool_with_indices_freq(c3, 9)
        # bottleneck: freq fully pooled (216/3/8/9 = 1) → time tokens
        b, t, f, c = c3.shape
        tokens = c3.reshape(b, t, c)
        tokens = self._attn_blocks(tokens, train)
        h = tokens.reshape(b, t, 1, c)
        u3 = _BNConvSELU(int(64 / sc), (3, 3), (1, 1),
                         name="up_conv3")(max_unpool_freq(h, ind3, 9), train)
        u2 = _BNConvSELU(int(32 / sc), (5, 5), (2, 2),
                         name="up_conv2")(max_unpool_freq(u3, ind2, 8), train)
        u1 = _BNConvSELU(int(n_ch[0] / sc), (5, 5), (2, 2),
                         name="up_conv1")(max_unpool_freq(u2, ind1, 3), train)
        head = PitchHead(n_ch, self.n_bins_in, self.n_bins_out, self.a_lrelu,
                         self.p_dropout, name="head")(u1, train)
        return _to_nchw(head)


class FreqUNetDoubleSelfAttn(FreqUNetSelfAttn):
    """Reference ``freq_u_net_doubleselfattn`` (unet_cnns.py:1820-1970):
    two stacked inline attention blocks at the bottleneck."""

    def _attn_blocks(self, tokens, train):
        c = int(128 / self.scalefac)
        tokens = _FreqAttnBlock(c, self.embed_dim, self.num_heads,
                                self.mlp_dim, self.p_dropout,
                                attn_mode=self.attn_mode,
                                name="attnblock1")(tokens, train)
        return _FreqAttnBlock(c, self.embed_dim, self.num_heads, self.mlp_dim,
                              self.p_dropout, suffix="2", ln_ids=(7, 8),
                              attn_mode=self.attn_mode,
                              name="attnblock2")(tokens, train)


# ---------------------------------------------------------------------------
# Polyphony (multi-task) U-Nets
# ---------------------------------------------------------------------------

class SimpleUNetDoubleSelfAttnPolyphony(_SimpleUNetCommon):
    """Reference ``simple_u_net_doubleselfattn_polyphony``
    (unet_cnns.py:1977-2066): SAUnet + a regression head ``convP`` on the
    *first* attention output estimating degree of polyphony.
    Returns ``(y_pred, n_pred)``; n_pred NCHW (B, 1, Tb-3, F')."""

    embed_dim: int = 32
    num_heads: int = 8
    mlp_dim: int = 512
    pos_encoding: Optional[str] = None
    attn_mode: str = "cross_batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc, dec = _std_geometry(self.scalefac, self.n_chan_layers[0])
        x = HarmonicLayerNorm(name="layernorm")(_to_nhwc(x))
        x1, x2, x3, x4, x5 = _encode(x, enc, (2, 2), train)
        x5_inner = TransformerEncLayer(
            self.embed_dim, self.num_heads, self.mlp_dim,
            pos_encoding=self.pos_encoding, attn_mode=self.attn_mode,
            name="attention1")(x5, train)
        x5 = TransformerEncLayer(self.embed_dim, self.num_heads, self.mlp_dim,
                                 attn_mode=self.attn_mode,
                                 name="attention2")(x5_inner, train)
        h = _decode(x5, [x4, x3, x2, x1], dec, (2, 2), train)
        y = self._head(h, train)
        n = _polyphony_head(x5_inner, self.embed_dim // 4, 1, self.a_lrelu,
                            self.p_dropout, train, relu_out=True)
        return _to_nchw(y), _to_nchw(n)


class SimpleUNetDoubleSelfAttnPolyphonyClassif(_SimpleUNetCommon):
    """Reference ``simple_u_net_doubleselfattn_polyphony_classif``
    (unet_cnns.py:2070-2159): polyphony as a ``num_polyphony_steps``-way
    classification (ReLU logits head, embed//2 mid channels)."""

    embed_dim: int = 32
    num_heads: int = 8
    mlp_dim: int = 512
    pos_encoding: Optional[str] = None
    num_polyphony_steps: int = 24
    attn_mode: str = "cross_batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc, dec = _std_geometry(self.scalefac, self.n_chan_layers[0])
        x = HarmonicLayerNorm(name="layernorm")(_to_nhwc(x))
        x1, x2, x3, x4, x5 = _encode(x, enc, (2, 2), train)
        x5_inner = TransformerEncLayer(
            self.embed_dim, self.num_heads, self.mlp_dim,
            pos_encoding=self.pos_encoding, attn_mode=self.attn_mode,
            name="attention1")(x5, train)
        x5 = TransformerEncLayer(self.embed_dim, self.num_heads, self.mlp_dim,
                                 attn_mode=self.attn_mode,
                                 name="attention2")(x5_inner, train)
        h = _decode(x5, [x4, x3, x2, x1], dec, (2, 2), train)
        y = self._head(h, train)
        n = _polyphony_head(x5_inner, self.embed_dim // 2,
                            self.num_polyphony_steps, self.a_lrelu,
                            self.p_dropout, train, relu_out=True)
        return _to_nchw(y), _to_nchw(n)


class SimpleUNetPolyphonyClassif(_SimpleUNetCommon):
    """Reference ``simple_u_net_polyphony_classif`` (unet_cnns.py:2163-2247):
    no attention; polyphony classification head off the raw bottleneck x5
    (ReLU logits)."""

    num_polyphony_steps: int = 24

    @nn.compact
    def __call__(self, x, train: bool = False):
        sc = self.scalefac
        enc, dec = _std_geometry(sc, self.n_chan_layers[0])
        x = HarmonicLayerNorm(name="layernorm")(_to_nhwc(x))
        x1, x2, x3, x4, x5 = _encode(x, enc, (2, 2), train)
        h = _decode(x5, [x4, x3, x2, x1], dec, (2, 2), train)
        y = self._head(h, train)
        n = _polyphony_head(x5, 1024 // (sc * 4), self.num_polyphony_steps,
                            self.a_lrelu, self.p_dropout, train, relu_out=True)
        return _to_nchw(y), _to_nchw(n)


class SimpleUNetPolyphonyClassifSoftmax(_SimpleUNetCommon):
    """Reference ``simple_u_net_polyphony_classif_softmax``
    (unet_cnns.py:2251-2335) — the paper's **PUnet M/L/XL** (exp195*, and the
    shipped pretrained checkpoint of notebook 02): like
    :class:`SimpleUNetPolyphonyClassif` but the polyphony head emits raw
    logits (softmax folded into the cross-entropy loss)."""

    num_polyphony_steps: int = 24

    @nn.compact
    def __call__(self, x, train: bool = False):
        sc = self.scalefac
        enc, dec = _std_geometry(sc, self.n_chan_layers[0])
        x = HarmonicLayerNorm(name="layernorm")(_to_nhwc(x))
        x1, x2, x3, x4, x5 = _encode(x, enc, (2, 2), train)
        h = _decode(x5, [x4, x3, x2, x1], dec, (2, 2), train)
        y = self._head(h, train)
        n = _polyphony_head(x5, 1024 // (sc * 4), self.num_polyphony_steps,
                            self.a_lrelu, self.p_dropout, train, relu_out=False)
        return _to_nchw(y), _to_nchw(n)
