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
