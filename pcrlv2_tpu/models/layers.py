"""Shared Flax building blocks with torch-parity initialization and semantics.

Initializers replicate torch defaults so fixed-seed runs draw from the same
distributions the reference does:

* torch ``nn.Conv*`` default: kaiming_uniform(a=√5) → U(±√(1/fan_in)); bias
  U(±1/√fan_in).
* decoder init (reference ``pcrlv2_model.py:23-38``): kaiming_uniform fan_in
  relu → U(±√(6/fan_in)) for convs, xavier_uniform for linears, zero bias.
* head init (reference ``pcrlv2_model.py:41-46``): xavier_uniform, zero bias.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pcrlv2_tpu.core.precision import Policy, DEFAULT_POLICY
from pcrlv2_tpu.ops import (
    conv2d,
    conv3d,
    conv_transpose3d,
)

# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

#: torch nn.Conv default weight init: kaiming_uniform(a=sqrt(5)) == U(±sqrt(1/fan_in)).
torch_conv_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)

#: kaiming_uniform(mode=fan_in, nonlinearity=relu): U(±sqrt(6/fan_in)).
kaiming_uniform_relu = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")

xavier_uniform = nn.initializers.xavier_uniform()


def torch_bias_init(fan_in: int) -> Callable:
    """torch default bias init: U(±1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# ---------------------------------------------------------------------------
# Norm / activation
# ---------------------------------------------------------------------------


def make_norm(norm: str, channels: int, policy: Policy) -> nn.Module:
    """Norm factory matching reference ``pcrlv2_model_3d.py:11-18``.

    torch BatchNorm momentum 0.1 == flax momentum 0.9 (running-average decay).
    """
    if norm == "bn":
        from pcrlv2_tpu.parallel.context import current_stat_axes

        return nn.BatchNorm(
            use_running_average=False,
            momentum=0.9,
            epsilon=1e-5,
            dtype=policy.compute_dtype,
            param_dtype=policy.param_dtype,
            # under spatial/batch sharding (shard_map), batch stats reduce
            # over the shards so train-mode normalization matches the
            # unsharded global batch exactly
            axis_name=current_stat_axes(),
        )
    if norm == "gn":
        return nn.GroupNorm(
            num_groups=8,
            epsilon=1e-5,
            dtype=policy.compute_dtype,
            param_dtype=policy.param_dtype,
        )
    if norm == "in":
        # InstanceNorm(affine=True) == GroupNorm with one group per channel.
        return nn.GroupNorm(
            num_groups=channels,
            epsilon=1e-5,
            dtype=policy.compute_dtype,
            param_dtype=policy.param_dtype,
        )
    raise ValueError(f"normalization type {norm} is not supported")


class PReLU(nn.Module):
    """Per-channel PReLU (torch ``nn.PReLU(out_chan)``), init 0.25."""

    channels: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha",
            lambda key, shape, dtype: jnp.full(shape, 0.25, dtype),
            (self.channels,),
            self.param_dtype,
        ).astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


def make_act(act: str, channels: int, policy: Policy):
    """Activation factory matching reference ``pcrlv2_model_3d.py:20-30``."""
    if act == "relu":
        return nn.relu
    if act == "prelu":
        return PReLU(channels=channels, param_dtype=policy.param_dtype)
    if act == "elu":
        return nn.elu
    if act == "sigmoid":
        return nn.sigmoid
    raise ValueError(f"activation type {act} is not supported")


# ---------------------------------------------------------------------------
# Conv modules (channels-last, functional ops underneath)
# ---------------------------------------------------------------------------


class Conv3d(nn.Module):
    """3D conv module over NDHWC using :func:`pcrlv2_tpu.ops.conv3d`."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    kernel_init: Callable = torch_conv_kernel_init
    bias_init: Callable | None = None  # None → torch default (needs fan_in)
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.kernel_size
        w = self.param(
            "kernel",
            self.kernel_init,
            (k, k, k, cin, self.features),
            self.policy.param_dtype,
        )
        b = None
        if self.use_bias:
            bias_init = self.bias_init or torch_bias_init(cin * k ** 3)
            b = self.param("bias", bias_init, (self.features,), self.policy.param_dtype)
        x = self.policy.cast_to_compute(x)
        return conv3d(x, w, b, stride=self.stride)


class ConvTranspose3d(nn.Module):
    """Transpose 3D conv module (torch ``nn.ConvTranspose3d`` semantics)."""

    features: int
    kernel_size: int = 2
    stride: int = 2
    use_bias: bool = True
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.kernel_size
        # torch ConvTranspose fan_in for init purposes = out_channels * k^3
        # (torch uses weight shape (in, out, k, k, k), fan_in = out*k^3).
        fan_in = self.features * k ** 3
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_out", "uniform"),
            (k, k, k, cin, self.features),
            self.policy.param_dtype,
        )
        b = None
        if self.use_bias:
            b = self.param(
                "bias", torch_bias_init(fan_in), (self.features,), self.policy.param_dtype
            )
        x = self.policy.cast_to_compute(x)
        return conv_transpose3d(x, w, b, stride=self.stride)


class Conv2d(nn.Module):
    """2D conv module over NHWC using :func:`pcrlv2_tpu.ops.conv2d`."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    kernel_init: Callable = torch_conv_kernel_init
    bias_init: Callable | None = None
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.kernel_size
        w = self.param(
            "kernel",
            self.kernel_init,
            (k, k, cin, self.features),
            self.policy.param_dtype,
        )
        b = None
        if self.use_bias:
            bias_init = self.bias_init or torch_bias_init(cin * k ** 2)
            b = self.param("bias", bias_init, (self.features,), self.policy.param_dtype)
        x = self.policy.cast_to_compute(x)
        return conv2d(x, w, b, stride=self.stride)


class Dense(nn.Module):
    """Linear layer with selectable init (torch default or xavier)."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = xavier_uniform
    bias_init: Callable = nn.initializers.zeros
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features),
            self.policy.param_dtype,
        )
        x = self.policy.cast_to_compute(x)
        out = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
        if self.use_bias:
            b = self.param("bias", self.bias_init, (self.features,),
                           self.policy.param_dtype)
            out = out + b
        return out.astype(x.dtype)


class MLPHead(nn.Module):
    """Predictor head: Linear(c→2c) → BN1d → ReLU → Linear(2c→c)
    (reference ``pcrlv2_model_3d.py:56-59``, ``pcrlv2_model.py:108-111``).

    Init differs by pipeline, matching the reference: the 3D model keeps
    torch ``nn.Linear`` defaults (no init pass exists upstream for it),
    while the 2D decoder's ``initialize_decoder`` re-inits every Linear with
    xavier_uniform weights and zero biases (``pcrlv2_model.py:23-38``) —
    select with ``decoder_init=True``.
    """

    channels: int
    policy: Policy = DEFAULT_POLICY
    decoder_init: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.decoder_init:
            k1 = k2 = xavier_uniform
            b1 = b2 = nn.initializers.zeros
        else:
            # torch nn.Linear default (kaiming_uniform a=√5 == U(±√(1/fan))).
            k1 = k2 = nn.initializers.variance_scaling(
                1.0 / 3.0, "fan_in", "uniform")
            b1 = torch_bias_init(self.channels)
            b2 = torch_bias_init(2 * self.channels)
        from pcrlv2_tpu.parallel.context import current_stat_axes

        x = Dense(2 * self.channels, kernel_init=k1, bias_init=b1,
                  policy=self.policy, name="fc1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.policy.compute_dtype,
                         param_dtype=self.policy.param_dtype,
                         axis_name=current_stat_axes(), name="bn")(x)
        x = nn.relu(x)
        x = Dense(self.channels, kernel_init=k2, bias_init=b2,
                  policy=self.policy, name="fc2")(x)
        return x
