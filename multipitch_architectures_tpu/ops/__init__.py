from .resize import upsample_bilinear_align_corners, up_concat_pad
from .attention import TorchMultiheadAttention, sinusoidal_positional_encoding
from .lstm import TorchLSTM
