"""Flax models with the reference's exact architecture contracts.

* ``PCRLv23d`` — 3D UNet (encoder 1→64→128→256→512, 3 SSL decoder levels,
  no skip connections); reference ``models/pcrlv2_model_3d.py:95-133``.
* ``PCRLv2``   — 2D ResNet-18 U-Net (5 decoder blocks with per-block
  mask/projection/predictor heads); reference ``models/pcrlv2_model.py:197-209``.
"""

from pcrlv2_tpu.models.unet3d import PCRLv23d  # noqa: F401
from pcrlv2_tpu.models.unet2d import PCRLv2  # noqa: F401
from pcrlv2_tpu.models.resnet import ResNet18Encoder  # noqa: F401
