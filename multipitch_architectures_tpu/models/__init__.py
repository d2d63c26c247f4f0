from .layers import (
    HarmonicLayerNorm,
    ConvBlock,
    DoubleConv,
    SingleConvSELU,
    TransformerEncLayer,
    TransformerTemporalEncLayer,
    BLSTMTemporalEncLayer,
    PitchHead,
)
from .cnns import (
    BasicCnn,
    BasicCnnPool,
    BasicCnnSegmSigmoid,
    BasicCnnSegmLogSoftmax,
    BasicCnnSegmBlankLogSoftmax,
    DeepCnnSegmSigmoid,
)
from .unets import (
    SimpleUNet,
    SimpleUNetLargeKernels,
    SimpleUNetSelfAttn,
    SimpleUNetDoubleSelfAttn,
    SimpleUNetSixSelfAttn,
    SimpleUNetDoubleSelfAttnTwoLayers,
    SimpleUNetDoubleSelfAttnAllLayers,
    SimpleUNetDoubleSelfAttnVarLayers,
    UNetBlstmVarLayers,
    UNetTemporalSelfAttnVarLayers,
    UNetTemporalBlstmVarLayers,
    SimpleUNetDoubleSelfAttnTransEnc,
    FreqUNet,
    FreqUNetBottomStack,
    FreqUNetSelfAttn,
    FreqUNetDoubleSelfAttn,
    SimpleUNetDoubleSelfAttnPolyphony,
    SimpleUNetDoubleSelfAttnPolyphonyClassif,
    SimpleUNetPolyphonyClassif,
    SimpleUNetPolyphonyClassifSoftmax,
)

# Reference-compatible snake_case aliases (libdl/nn_models/__init__.py:1-10).
basic_cnn = BasicCnn
basic_cnn_pool = BasicCnnPool
basic_cnn_segm_sigmoid = BasicCnnSegmSigmoid
basic_cnn_segm_logsoftmax = BasicCnnSegmLogSoftmax
basic_cnn_segm_blank_logsoftmax = BasicCnnSegmBlankLogSoftmax
deep_cnn_segm_sigmoid = DeepCnnSegmSigmoid
simple_u_net = SimpleUNet
simple_u_net_largekernels = SimpleUNetLargeKernels
simple_u_net_selfattn = SimpleUNetSelfAttn
simple_u_net_doubleselfattn = SimpleUNetDoubleSelfAttn
simple_u_net_sixselfattn = SimpleUNetSixSelfAttn
simple_u_net_doubleselfattn_twolayers = SimpleUNetDoubleSelfAttnTwoLayers
simple_u_net_doubleselfattn_alllayers = SimpleUNetDoubleSelfAttnAllLayers
simple_u_net_doubleselfattn_varlayers = SimpleUNetDoubleSelfAttnVarLayers
u_net_blstm_varlayers = UNetBlstmVarLayers
u_net_temporal_selfattn_varlayers = UNetTemporalSelfAttnVarLayers
u_net_temporal_blstm_varlayers = UNetTemporalBlstmVarLayers
simple_u_net_doubleselfattn_transenc = SimpleUNetDoubleSelfAttnTransEnc
freq_u_net = FreqUNet
freq_u_net_bottomstack = FreqUNetBottomStack
freq_u_net_selfattn = FreqUNetSelfAttn
freq_u_net_doubleselfattn = FreqUNetDoubleSelfAttn
simple_u_net_doubleselfattn_polyphony = SimpleUNetDoubleSelfAttnPolyphony
simple_u_net_doubleselfattn_polyphony_classif = (
    SimpleUNetDoubleSelfAttnPolyphonyClassif
)
simple_u_net_polyphony_classif = SimpleUNetPolyphonyClassif
simple_u_net_polyphony_classif_softmax = SimpleUNetPolyphonyClassifSoftmax

# Building-block aliases (libdl/nn_models/__init__.py also re-exports the
# blocks; unet_cnns.py:13-243). ``single_conv`` is broken upstream
# (undefined ``mid_channels``, unet_cnns.py:13-27) — the alias points at
# the working single-stage block used where the evident intent needs one
# (SingleConvSELU, see FreqUNet). ``unet_up_concat_padding`` is a pure
# function here (bilinear 2x upsample + pad-to-skip + concat,
# ops/resize.py) rather than a stateless nn.Module.
double_conv = DoubleConv
single_conv = SingleConvSELU
transformer_enc_layer = TransformerEncLayer
transformer_temporal_enc_layer = TransformerTemporalEncLayer
blstm_temporal_enc_layer = BLSTMTemporalEncLayer

from ..ops.resize import up_concat_pad as unet_up_concat_padding  # noqa: E402
