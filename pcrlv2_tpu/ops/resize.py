"""Interpolation ops.

Reference usage (SURVEY.md §3.4):

* nearest ×2 upsample in the 2D decoder      — ``pcrlv2_model.py:114``
* bilinear ×2^(4-i) middle-mask upsample     — ``pcrlv2_model.py:192``
* trilinear ×4/×2 middle-mask upsample       — ``pcrlv2_model_3d.py:125-126``

Torch's ``F.interpolate(..., align_corners=False)`` uses half-pixel source
coordinates, which is exactly ``jax.image.resize(method='linear')``.
Nearest ×2 is an exact ``jnp.repeat`` (index ``floor(i/2)``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample_nearest2x_2d(x: jax.Array) -> jax.Array:
    """×2 nearest upsample of NHWC (torch ``mode='nearest'``, scale 2)."""
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


def upsample_linear(x: jax.Array, scale: int) -> jax.Array:
    """Bi/tri-linear upsample by an integer scale over all spatial dims.

    ``x`` is channels-last with any number of spatial dims:
    (B, *spatial, C) → (B, *spatial·scale, C).  Matches torch
    ``F.interpolate(mode='bilinear'/'trilinear', align_corners=False)``.
    """
    if scale == 1:
        return x
    out_shape = (x.shape[0],) + tuple(s * scale for s in x.shape[1:-1]) + (x.shape[-1],)
    return jax.image.resize(x, out_shape, method="linear").astype(x.dtype)


def resize_linear(x: jax.Array, spatial_shape) -> jax.Array:
    """Linear resize of channels-last (B, *spatial, C) to ``spatial_shape``."""
    out_shape = (x.shape[0],) + tuple(spatial_shape) + (x.shape[-1],)
    return jax.image.resize(x, out_shape, method="linear").astype(x.dtype)
