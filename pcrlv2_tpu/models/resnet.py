"""ResNet-18 encoder, torchvision/smp parity.

The reference's 2D encoder is ``smp.Unet('resnet18', in_channels=3)``'s
encoder (reference ``pcrlv2_model.py:200``), i.e. torchvision ResNet-18
exposed as a 6-stage feature pyramid with out_channels (3, 64, 64, 128, 256,
512): [identity, conv1+bn+relu (/2), maxpool+layer1 (/4), layer2 (/8),
layer3 (/16), layer4 (/32)].

Init matches torchvision's from-scratch scheme (kaiming_normal fan_out relu
for convs, BN γ=1 β=0).  **Deviation:** the reference's smp default starts
from ImageNet weights; this environment has no network access, so 2D
pretraining starts from scratch unless a torch ResNet-18 state_dict is
supplied — ``pcrlv2_tpu.train.checkpoint.import_resnet18_encoder(path)``
converts one, and the CLI loads it via ``--encoder_weights <file.pt>``.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from pcrlv2_tpu.core.precision import Policy, DEFAULT_POLICY
from pcrlv2_tpu.models.layers import Conv2d
from pcrlv2_tpu.ops.pooling import max_pool2d

#: torchvision resnet conv init: kaiming_normal(mode=fan_out, nonlinearity=relu).
kaiming_normal_fan_out = nn.initializers.variance_scaling(
    2.0, "fan_out", "truncated_normal"
)
# NB torch uses an untruncated normal; truncated is flax's closest stock
# initializer and matches variance closely (documented deviation).


def _bn(policy: Policy, train: bool, name: str):
    from pcrlv2_tpu.parallel.context import current_stat_axes

    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                        dtype=policy.compute_dtype, param_dtype=policy.param_dtype,
                        axis_name=current_stat_axes(), name=name)


class BasicBlock(nn.Module):
    """torchvision ``BasicBlock``: 3×3 conv ×2 + identity/1×1-downsample."""

    features: int
    stride: int = 1
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        out = Conv2d(self.features, kernel_size=3, stride=self.stride,
                     use_bias=False, kernel_init=kaiming_normal_fan_out,
                     policy=self.policy, name="conv1")(x)
        out = _bn(self.policy, train, "bn1")(out)
        out = nn.relu(out)
        out = Conv2d(self.features, kernel_size=3, use_bias=False,
                     kernel_init=kaiming_normal_fan_out,
                     policy=self.policy, name="conv2")(out)
        out = _bn(self.policy, train, "bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = Conv2d(self.features, kernel_size=1, stride=self.stride,
                              use_bias=False, kernel_init=kaiming_normal_fan_out,
                              policy=self.policy, name="downsample_conv")(x)
            identity = _bn(self.policy, train, "downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet18Encoder(nn.Module):
    """6-stage feature pyramid matching smp's ResNetEncoder contract."""

    in_channels: int = 3
    policy: Policy = DEFAULT_POLICY

    #: per-stage output channels, smp ``encoder.out_channels``
    out_channels: Sequence[int] = (3, 64, 64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = True):
        p = self.policy
        feats = [x]
        x = p.cast_to_compute(x)
        x = Conv2d(64, kernel_size=7, stride=2, use_bias=False,
                   kernel_init=kaiming_normal_fan_out, policy=p, name="conv1")(x)
        x = _bn(p, train, "bn1")(x)
        x = nn.relu(x)
        feats.append(x)  # 64, /2
        x = max_pool2d(x, window=3, stride=2, padding=1)
        for stage, (width, stride) in enumerate(
            [(64, 1), (128, 2), (256, 2), (512, 2)], start=1
        ):
            x = BasicBlock(width, stride=stride, policy=p,
                           name=f"layer{stage}_0")(x, train)
            x = BasicBlock(width, stride=1, policy=p,
                           name=f"layer{stage}_1")(x, train)
            feats.append(x)
        return feats
