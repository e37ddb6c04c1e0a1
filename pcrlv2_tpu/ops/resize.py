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

    Under a spatial-sharding scope, the sharded leading spatial dim is
    upsampled with a 1-plane halo and per-phase 2-tap stencils (exactly the
    half-pixel linear kernel), the local dims with ``jax.image.resize``.
    """
    if scale == 1:
        return x
    from pcrlv2_tpu.parallel.context import current_spatial_axis

    ax = current_spatial_axis()
    if ax is not None:
        return _upsample_linear_sharded(x, scale, ax)
    out_shape = (x.shape[0],) + tuple(s * scale for s in x.shape[1:-1]) + (x.shape[-1],)
    return jax.image.resize(x, out_shape, method="linear").astype(x.dtype)


def _upsample_linear_sharded(x: jax.Array, scale: int, axis_name: str) -> jax.Array:
    """×scale linear upsample of (B, Dl, H, W, C) with dim 1 depth-sharded.

    Half-pixel convention: output plane j samples input at
    ``(j + 0.5)/scale − 0.5`` — a 2-tap stencil within ±1 input plane, so one
    edge-clamped halo plane per side suffices for any integer scale ≥ 2.
    """
    from pcrlv2_tpu.parallel.spatial import halo_exchange

    # local dims (H, W) first — ordinary resize per shard
    b, dl, h, w, c = x.shape
    local_shape = (b, dl, h * scale, w * scale, c)
    x = jax.image.resize(x, local_shape, method="linear").astype(x.dtype)

    xh = halo_exchange(x, axis_name, halo=1, boundary="edge")
    core = xh[:, 1:-1]
    left = xh[:, :-2]
    right = xh[:, 2:]
    phases = []
    for p in range(scale):
        delta = (p + 0.5) / scale - 0.5
        if delta < 0:
            phases.append((-delta) * left + (1.0 + delta) * core)
        else:
            phases.append((1.0 - delta) * core + delta * right)
    # (B, Dl, scale, H', W', C) → (B, Dl·scale, H', W', C)
    out = jnp.stack(phases, axis=2)
    return out.reshape(b, dl * scale, h * scale, w * scale, c).astype(x.dtype)


def resize_linear(x: jax.Array, spatial_shape) -> jax.Array:
    """Linear resize of channels-last (B, *spatial, C) to ``spatial_shape``."""
    out_shape = (x.shape[0],) + tuple(spatial_shape) + (x.shape[-1],)
    return jax.image.resize(x, out_shape, method="linear").astype(x.dtype)
