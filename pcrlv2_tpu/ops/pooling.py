"""Pooling ops (``nn.MaxPool3d(2)`` reference ``pcrlv2_model_3d.py:100``;
``F.adaptive_avg_pool{2,3}d(·, 1)`` reference ``pcrlv2_model_3d.py:67``,
``pcrlv2_model.py:125``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def max_pool3d(x: jax.Array, window: int = 2, stride: int | None = None) -> jax.Array:
    """Max pool over the three spatial dims of an NDHWC tensor."""
    if stride is None:
        stride = window
    dims = (1, window, window, window, 1)
    strides = (1, stride, stride, stride, 1)
    return lax.reduce_window(x, -jnp.inf, lax.max, dims, strides, "VALID")


def max_pool2d(x: jax.Array, window: int = 2, stride: int | None = None,
               padding: int = 0) -> jax.Array:
    """Max pool over the two spatial dims of an NHWC tensor (torch semantics:
    symmetric zero pad of ``padding`` then VALID window)."""
    if stride is None:
        stride = window
    dims = (1, window, window, 1)
    strides = (1, stride, stride, 1)
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return lax.reduce_window(x, -jnp.inf, lax.max, dims, strides, pad)


def global_avg_pool(x: jax.Array) -> jax.Array:
    """Adaptive average pool to (1,…,1) + flatten: (B, …spatial…, C) → (B, C).

    Mean accumulates in f32 regardless of activation dtype.  Under a
    spatial-sharding scope the local mean is ``pmean``-ed over the shards
    (equal shard sizes make the two-stage mean exact).
    """
    from pcrlv2_tpu.parallel.context import current_spatial_axis

    spatial_axes = tuple(range(1, x.ndim - 1))
    out = jnp.mean(x.astype(jnp.float32), axis=spatial_axes)
    ax = current_spatial_axis()
    if ax is not None:
        out = lax.pmean(out, ax)
    return out.astype(x.dtype)
