"""Shared separable Gaussian blur primitives (windowed-matmul formulation).

One implementation serves both augmentation stacks: the 3D torchio
``RandomBlur`` (scipy ``gaussian_filter`` semantics, reflect padding) and the
2D PIL ``ImageFilter.GaussianBlur`` replacement (edge padding, reference
``utils.py:139-148``).  The 1-D pass unfolds the padded axis into (L, K)
windows and contracts with the kernel — one einsum per axis, no conv
lowering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: fixed 17-tap kernel ≈ scipy truncate=4 at σ_max=2 (static shape under jit)
BLUR_RADIUS = 8


def gaussian_kernel(sigma: jax.Array, radius: int = BLUR_RADIUS) -> jax.Array:
    """Normalized Gaussian taps; degenerates to a delta for σ → 0."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    w = jnp.exp(-0.5 * (x / jnp.maximum(sigma, 1e-6)) ** 2)
    w = jnp.where(sigma < 1e-4, (x == 0).astype(jnp.float32), w)
    return w / jnp.sum(w)


def blur_axis(img: jax.Array, kernel: jax.Array, axis: int,
              pad_mode: str = "reflect") -> jax.Array:
    """1-D convolution along ``axis`` with the given taps and padding mode."""
    r = (kernel.shape[0] - 1) // 2
    moved = jnp.moveaxis(img, axis, -1)
    pad = [(0, 0)] * (moved.ndim - 1) + [(r, r)]
    padded = jnp.pad(moved, pad, mode=pad_mode)
    idx = jnp.arange(moved.shape[-1])[:, None] + jnp.arange(2 * r + 1)[None, :]
    out = jnp.einsum("...lk,k->...l", padded[..., idx], kernel)
    return jnp.moveaxis(out, -1, axis)
