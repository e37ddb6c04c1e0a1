"""PCRLv23d — 3D UNet with multi-scale self-supervised heads.

Architecture parity with reference ``models/pcrlv2_model_3d.py:95-133``:

* Encoder: 4 ``DownTransition`` stages of 2×(Conv3d 3³ + Norm + Act)
  (``LUConv`` reference ``:6-34``), channels 1→(32→64)→(64→128)→(128→256)→
  (256→512) with MaxPool3d(2) between stages (``:114-117``).
* Decoder: 3 ``UpTransition`` = ConvTranspose3d(k2,s2) + 2×LUConv
  (double-channel variant of ``_make_nConv``, ``:37-45``), 512→256→128→64.
  Each level carries three SSL heads (``:62-72``):
  - ``x_pro``: GAP → BatchNorm1d projection,
  - ``x_pre``: 2-layer MLP predictor,
  - ``x_mask``: LUConv(channels→1, sigmoid) deep-supervision mask.
* ``OutputTransition``: Conv3d 1³ (64→1) + sigmoid (``:75-83``).
* No skip connections (commented out in reference ``:65``).
* Forward returns ``(out, middle_features[3×(pro, pre)], middle_masks[3])``
  with middle masks trilinear-upsampled ×4/×2/×1 to the input resolution
  (``:112-133``); with ``local=True`` the mask upsampling is skipped.

Layout is NDHWC (channels last, TPU-native): input (B, X, Y, Z, 1) for the
reference's (B, 1, X, Y, Z).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from pcrlv2_tpu.core.precision import Policy, DEFAULT_POLICY
from pcrlv2_tpu.models.layers import (
    Conv3d,
    ConvTranspose3d,
    MLPHead,
    make_act,
    make_norm,
)
from pcrlv2_tpu.ops import global_avg_pool, max_pool3d, upsample_linear


class LUConv(nn.Module):
    """Conv3d(3³, pad 1) → Norm → Act (reference ``pcrlv2_model_3d.py:6-34``)."""

    features: int
    act: str = "relu"
    norm: str = "bn"
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv3d(self.features, kernel_size=3, policy=self.policy, name="conv1")(x)
        norm = make_norm(self.norm, self.features, self.policy)
        if self.norm == "bn":
            x = norm.copy(use_running_average=not train, name="bn1")(x)
        else:
            x = norm.copy(name="bn1")(x)
        act = make_act(self.act, self.features, self.policy)
        return act(x)


class DownTransition(nn.Module):
    """2×LUConv: in → 32·2^depth → 64·2^depth (reference ``:37-45,86-92``)."""

    depth: int
    act: str = "relu"
    norm: str = "bn"
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = 32 * (2 ** self.depth)
        x = LUConv(c, self.act, self.norm, self.policy, name="ops0")(x, train)
        x = LUConv(2 * c, self.act, self.norm, self.policy, name="ops1")(x, train)
        return x


class UpTransition(nn.Module):
    """ConvTranspose3d(k2,s2) + 2×LUConv + three SSL heads
    (reference ``pcrlv2_model_3d.py:48-72``)."""

    out_chans: int  # transpose-conv output channels
    depth: int
    act: str = "relu"
    norm: str = "bn"
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = True):
        channels = 32 * (2 ** self.depth) * 2
        x = ConvTranspose3d(self.out_chans, kernel_size=2, stride=2,
                            policy=self.policy, name="up_conv")(x)
        x = LUConv(channels, self.act, self.norm, self.policy, name="ops0")(x, train)
        x = LUConv(channels, self.act, self.norm, self.policy, name="ops1")(x, train)
        x_pro = global_avg_pool(x)  # pmean'd under spatial sharding
        from pcrlv2_tpu.parallel.context import current_stat_axes

        x_pro = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.policy.compute_dtype,
                             param_dtype=self.policy.param_dtype,
                             axis_name=current_stat_axes(), name="bn")(x_pro)
        x_pre = MLPHead(channels, policy=self.policy,
                        name="predictor_head")(x_pro, train)
        x_mask = LUConv(1, "sigmoid", self.norm, self.policy,
                        name="deep_supervision_head")(x, train)
        return x, x_pro, x_pre, x_mask


class OutputTransition(nn.Module):
    """Conv3d 1³ → sigmoid (reference ``pcrlv2_model_3d.py:75-83``)."""

    n_labels: int = 1
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        x = Conv3d(self.n_labels, kernel_size=1, policy=self.policy,
                   name="final_conv")(x)
        return nn.sigmoid(x)


class PCRLv23d(nn.Module):
    """3D UNet flagship model (reference ``pcrlv2_model_3d.py:95-133``).

    ``__call__(x, local=False, train=True)`` with x: (B, X, Y, Z, C_in) returns
    ``(out, middle_features, middle_masks)``:

    * ``out``: (B, X, Y, Z, n_class) sigmoid restoration mask,
    * ``middle_features``: list of 3 ``(pro, pre)`` pairs, dims 256/128/64,
      ordered deep→shallow,
    * ``middle_masks``: list of 3 masks at input resolution (empty if
      ``local=True``).
    """

    n_class: int = 1
    act: str = "relu"
    norm: str = "bn"
    in_channels: int = 1
    policy: Policy = DEFAULT_POLICY
    #: rematerialize each transition's activations in the backward pass —
    #: trades ~⅓ more conv FLOPs for fitting ~2× the batch in HBM
    remat: bool = False
    #: when False, middle masks are returned at their native decoder
    #: resolutions (16³·8 / 32³·16 / 64³·32) instead of trilinearly
    #: upsampled to input resolution (reference ``pcrlv2_model_3d.py:125-126``).
    #: The train step then upsamples ONLY the level the sampled deep-
    #: supervision term selects (``lax.switch`` in ``train.step``) — the other
    #: two levels' upsample forwards and their whole backward paths are
    #: skipped, which the stacked full-res form forces XLA to compute (their
    #: gradients are exactly zero either way, so the trajectory is unchanged —
    #: pinned by ``tests/test_train_step.py::test_native_masks_match_upsampled``)
    upsample_masks: bool = True

    @nn.compact
    def __call__(self, x, local: bool = False, train: bool = True):
        p = self.policy
        Down, Up = DownTransition, UpTransition
        if self.remat:
            Down = nn.remat(DownTransition, static_argnums=(2,))
            Up = nn.remat(UpTransition, static_argnums=(2,))
        x = p.cast_to_compute(x)
        skip64 = Down(0, self.act, self.norm, p, name="down_tr64")(x, train)
        skip128 = Down(1, self.act, self.norm, p,
                       name="down_tr128")(max_pool3d(skip64), train)
        skip256 = Down(2, self.act, self.norm, p,
                       name="down_tr256")(max_pool3d(skip128), train)
        out512 = Down(3, self.act, self.norm, p,
                      name="down_tr512")(max_pool3d(skip256), train)

        out256, pro256, pre256, mask256 = Up(
            512, 2, self.act, self.norm, p, name="up_tr256")(out512, train)
        out128, pro128, pre128, mask128 = Up(
            256, 1, self.act, self.norm, p, name="up_tr128")(out256, train)
        out64, pro64, pre64, mask64 = Up(
            128, 0, self.act, self.norm, p, name="up_tr64")(out128, train)

        middle_masks = []
        if not local:
            if self.upsample_masks:
                middle_masks.append(upsample_linear(mask256, 4))
                middle_masks.append(upsample_linear(mask128, 2))
                middle_masks.append(mask64)
            else:
                middle_masks.extend([mask256, mask128, mask64])
        middle_features = [(pro256, pre256), (pro128, pre128), (pro64, pre64)]

        out = OutputTransition(self.n_class, policy=p, name="out_tr")(out64)
        return out, middle_features, middle_masks
