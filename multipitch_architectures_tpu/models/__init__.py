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

# Reference-compatible snake_case aliases (libdl/nn_models/__init__.py:1-10).
basic_cnn = BasicCnn
basic_cnn_pool = BasicCnnPool
basic_cnn_segm_sigmoid = BasicCnnSegmSigmoid
basic_cnn_segm_logsoftmax = BasicCnnSegmLogSoftmax
basic_cnn_segm_blank_logsoftmax = BasicCnnSegmBlankLogSoftmax
deep_cnn_segm_sigmoid = DeepCnnSegmSigmoid
