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
import numpy as np

#: fixed 17-tap kernel ≈ scipy truncate=4 at σ_max=2 (static shape under jit)
BLUR_RADIUS = 8


def gaussian_kernel(sigma: jax.Array, radius: int = BLUR_RADIUS) -> jax.Array:
    """Normalized Gaussian taps; degenerates to a delta for σ → 0."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    w = jnp.exp(-0.5 * (x / jnp.maximum(sigma, 1e-6)) ** 2)
    w = jnp.where(sigma < 1e-4, (x == 0).astype(jnp.float32), w)
    return w / jnp.sum(w)


def _band_matrix(n: int, kernel: jax.Array, pad_mode: str) -> jax.Array:
    """(n, n) banded operator: ``W[o, s] = Σ_taps kernel[k]·[map(o−r+k) == s]``
    with the padding mode folded into the boundary columns — so the blur is
    ONE matmul on the MXU instead of a 17-wide sliding-window gather on the
    VPU (the taps are traced values — σ is sampled per call — but the tap→
    source index map is static, so each tap contributes a static one-hot)."""
    r = (kernel.shape[0] - 1) // 2
    o = np.arange(n)
    w = jnp.zeros((n, n), kernel.dtype)
    for k in range(2 * r + 1):
        src = o - r + k
        if pad_mode == "edge":
            src = np.clip(src, 0, n - 1)
        else:  # reflect (scipy/np convention, no edge duplication)
            src = np.abs(src)
            src = np.where(src >= n, 2 * (n - 1) - src, src)
        w = w.at[o, src].add(kernel[k])
    return w


def blur_axis(img: jax.Array, kernel: jax.Array, axis: int,
              pad_mode: str = "reflect") -> jax.Array:
    """1-D convolution along ``axis`` with the given taps and padding mode,
    as a banded-matrix contraction (MXU) — same numerics as the
    sliding-window formulation."""
    n = img.shape[axis]
    w = _band_matrix(n, kernel, pad_mode)
    moved = jnp.moveaxis(img, axis, -1)
    out = jnp.einsum("os,...s->...o", w, moved)
    return jnp.moveaxis(out, -1, axis)
