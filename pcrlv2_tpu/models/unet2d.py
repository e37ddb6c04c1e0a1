"""PCRLv2 — 2D ResNet-18 U-Net with multi-scale self-supervised heads.

Architecture parity with reference ``models/pcrlv2_model.py:197-209``:

* Encoder: ResNet-18 feature pyramid (smp ``Unet('resnet18')`` encoder).
* Decoder (``PCRLv2Decoder``, reference ``:131-194``): 5 ``DecoderBlock``s,
  channels (256, 128, 64, 32, 16) from encoder head 512; **skip connections
  disabled** (commented out, reference ``:115-117``); the smp ``Attention``
  modules are ``attention_type=None`` == identity (reference ``:85,93,141``)
  and are therefore omitted.
* Each ``DecoderBlock`` (reference ``:68-128``): ×2 nearest upsample →
  2×(Conv3×3+BN+ReLU) → heads: deep-supervision mask (Conv3×3+BN+ReLU+
  Conv1×1→3ch), GAP→BN1d projection ``x_pro``, 2-layer MLP predictor
  ``x_pre``.
* Middle masks bilinear-upsampled ×2^(4-i) to full resolution
  (reference ``:192``).
* Segmentation head: Conv3×3 (16→n_class), applied unless ``local``
  (reference ``:203-209``).

Returns ``(decoder_outputs[5×(pro, pre)], masks, middle_masks[5])`` — note the
different top-level ordering from the 3D model, mirrored from the reference
(``pcrlv2_model.py:209`` vs ``pcrlv2_model_3d.py:133``).

Deviation (performance, not behavior): the reference computes middle masks for
local views and discards them (``pcrlv2_model.py:205`` passes no ``local``
flag to the decoder); here ``local=True`` skips those dead convolutions.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pcrlv2_tpu.core.precision import Policy, DEFAULT_POLICY
from pcrlv2_tpu.models.layers import (
    Conv2d,
    MLPHead,
    kaiming_uniform_relu,
    xavier_uniform,
)
from pcrlv2_tpu.models.resnet import ResNet18Encoder
from pcrlv2_tpu.ops import global_avg_pool, upsample_linear, upsample_nearest2x_2d


def _bn(policy: Policy, train: bool, name: str):
    from pcrlv2_tpu.parallel.context import current_stat_axes

    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                        dtype=policy.compute_dtype, param_dtype=policy.param_dtype,
                        axis_name=current_stat_axes(), name=name)


class Conv2dReLU(nn.Module):
    """smp ``md.Conv2dReLU``: Conv3×3 (no bias with BN) + BN + ReLU."""

    features: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv2d(self.features, kernel_size=3, use_bias=False,
                   kernel_init=kaiming_uniform_relu, policy=self.policy,
                   name="conv")(x)
        x = _bn(self.policy, train, "bn")(x)
        return nn.relu(x)


class DecoderBlock(nn.Module):
    """Reference ``pcrlv2_model.py:68-128`` (decoder-initialized weights:
    kaiming_uniform-relu convs, xavier linears, zero biases;
    reference ``:23-38,176``)."""

    features: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = True, local: bool = False):
        p = self.policy
        x = upsample_nearest2x_2d(x)
        x = Conv2dReLU(self.features, policy=p, name="conv1")(x, train)
        x = Conv2dReLU(self.features, policy=p, name="conv2")(x, train)
        x_mask = None
        if not local:
            m = Conv2d(self.features, kernel_size=3,
                       kernel_init=kaiming_uniform_relu,
                       bias_init=nn.initializers.zeros,
                       policy=p, name="ds_conv1")(x)
            m = _bn(p, train, "ds_bn")(m)
            m = nn.relu(m)
            x_mask = Conv2d(3, kernel_size=1, kernel_init=kaiming_uniform_relu,
                            bias_init=nn.initializers.zeros,
                            policy=p, name="ds_conv2")(m)
        x_pro = global_avg_pool(x)
        x_pro = _bn(p, train, "bn")(x_pro)
        # decoder_init: the reference re-inits decoder Linears with xavier
        # weights / zero biases (initialize_decoder, pcrlv2_model.py:23-38)
        x_pre = MLPHead(self.features, policy=p, decoder_init=True,
                        name="predictor_head")(x_pro, train)
        return x, x_pro, x_pre, x_mask


class PCRLv2(nn.Module):
    """2D flagship model (reference ``pcrlv2_model.py:197-209``).

    ``__call__(x, local=False, train=True)`` with x: (B, H, W, 3) NHWC.
    """

    n_class: int = 3
    decoder_channels: tuple = (256, 128, 64, 32, 16)
    policy: Policy = DEFAULT_POLICY
    #: when False, middle masks come back at native decoder resolutions and
    #: the train step upsamples only the sampled level (see the 3D model's
    #: docstring for the rationale); True matches the reference API
    #: (``pcrlv2_model.py:192`` upsamples every level in-model).
    upsample_masks: bool = True

    @nn.compact
    def __call__(self, x, local: bool = False, train: bool = True):
        p = self.policy
        feats = ResNet18Encoder(policy=p, name="encoder")(x, train)
        # PCRLv2Decoder.forward: drop the identity feature, reverse, take head
        # (reference pcrlv2_model.py:178-183); skips are unused (no concat).
        x = feats[-1]
        decoder_outputs = []
        middle_masks = []
        for i, ch in enumerate(self.decoder_channels):
            x, x_pro, x_pre, x_mask = DecoderBlock(
                ch, policy=p, name=f"block{i}")(x, train, local)
            decoder_outputs.append((x_pro, x_pre))
            if not local:
                middle_masks.append(
                    upsample_linear(x_mask, 2 ** (4 - i))
                    if self.upsample_masks else x_mask)
        masks = None
        if not local:
            # smp SegmentationHead: Conv3×3 16→n_class, xavier init
            # (reference pcrlv2_model.py:208 + smp initialize_head).
            masks = Conv2d(self.n_class, kernel_size=3,
                           kernel_init=xavier_uniform,
                           bias_init=nn.initializers.zeros,
                           policy=p, name="segmentation_head")(x)
        return decoder_outputs, masks, middle_masks
