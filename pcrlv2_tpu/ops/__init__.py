"""TPU compute ops: channels-last convolutions, pooling, resize, blur.

Everything here replaces a cuDNN/native op the reference leans on (see
SURVEY.md §2.2): conv2d/3d and transpose-conv (cuDNN), max/avg pooling,
nearest/bilinear/trilinear interpolation.  Each op has an XLA implementation
(this module) and, for the hot 3D convs, a Pallas kernel (``pcrlv2_tpu.ops.pallas``)
selected by dispatch.
"""

from pcrlv2_tpu.ops.convolution import (  # noqa: F401
    conv2d,
    conv3d,
    conv_transpose3d,
    depthwise_conv2d,
    depthwise_conv3d,
)
from pcrlv2_tpu.ops.pooling import max_pool3d, global_avg_pool  # noqa: F401
from pcrlv2_tpu.ops.resize import (  # noqa: F401
    upsample_nearest2x_2d,
    upsample_linear,
    resize_linear,
)
