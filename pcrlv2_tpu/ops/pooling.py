"""Pooling ops (``nn.MaxPool3d(2)`` reference ``pcrlv2_model_3d.py:100``;
``F.adaptive_avg_pool{2,3}d(·, 1)`` reference ``pcrlv2_model_3d.py:67``,
``pcrlv2_model.py:125``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _max_pool3d_rw(x: jax.Array, window: int, stride: int) -> jax.Array:
    dims = (1, window, window, window, 1)
    strides = (1, stride, stride, stride, 1)
    return lax.reduce_window(x, -jnp.inf, lax.max, dims, strides, "VALID")


@jax.custom_vjp
def _max_pool3d_2x2(x: jax.Array) -> jax.Array:
    """2^3 stride-2 max pool — the only pooling the 3D model uses.

    Forward as reshape+max (non-overlapping windows; measured ~1.5x faster
    than reduce_window on v5e), backward as reduce_window's own VJP
    (select-and-scatter), which routes the gradient to the FIRST max like
    torch — ties are common after ReLU (zeros), so the equal-split tie
    behavior of reshape+max's native grad would break trajectory parity.
    """
    b, d, h, w, c = x.shape
    r = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    return r.max(axis=(2, 4, 6))


def _max_pool3d_2x2_fwd(x):
    return _max_pool3d_2x2(x), x


def _max_pool3d_2x2_bwd(x, g):
    _, vjp = jax.vjp(lambda x: _max_pool3d_rw(x, 2, 2), x)
    return vjp(g)


_max_pool3d_2x2.defvjp(_max_pool3d_2x2_fwd, _max_pool3d_2x2_bwd)


def max_pool3d(x: jax.Array, window: int = 2, stride: int | None = None) -> jax.Array:
    """Max pool over the three spatial dims of an NDHWC tensor."""
    if stride is None:
        stride = window
    if (window == 2 and stride == 2
            and all(s % 2 == 0 for s in x.shape[1:4])):
        return _max_pool3d_2x2(x)
    return _max_pool3d_rw(x, window, stride)


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
