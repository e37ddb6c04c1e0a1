"""Channels-last convolution ops.

The reference's conv surface (SURVEY.md §3.4 ops census):

* ``nn.Conv3d(k=3, padding=1)``           — reference ``pcrlv2_model_3d.py:9``
* ``nn.Conv3d(k=1)``                      — reference ``pcrlv2_model_3d.py:78``
* ``nn.ConvTranspose3d(k=2, stride=2)``   — reference ``pcrlv2_model_3d.py:52``
* ``nn.Conv2d(k=3/k=1)`` via smp          — reference ``pcrlv2_model.py``

TPU-first decisions:

* **NDHWC / NHWC layouts** — channels last keeps the channel dimension on the
  128-wide lane axis so XLA tiles convs straight onto the MXU.
* **k2s2 transpose-conv as an einsum** — with kernel == stride there is no
  output overlap, so the transpose conv is exactly one matmul
  ``(B·D·H·W, Ci) @ (Ci, Co·8)`` followed by a free reshape/transpose.  This
  avoids the gradient-style conv lowering entirely and runs as a single MXU op.
* **bf16 compute, f32 accumulation** — the MXU accumulates bf16 contractions
  in f32 internally; outputs stay in the compute dtype.  (An explicit
  ``preferred_element_type`` is avoided: its conv transpose rule feeds an f32
  cotangent into a bf16 conv and fails to lower.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# dimension_numbers: (lhs, rhs, out)
DN_3D = ("NDHWC", "DHWIO", "NDHWC")
DN_2D = ("NHWC", "HWIO", "NHWC")


def _same_padding(kernel_spatial):
    """Torch ``padding=k//2`` == SAME for odd k, which is all the reference uses."""
    return [(k // 2, k // 2) for k in kernel_spatial]


def conv_impl() -> str:
    """Which conv3d implementation to use:

    * ``"xla"`` (default) — XLA's conv everywhere.  The Pallas kernels below
      beat XLA *standalone* on select shapes but lose in the fused train
      program (pad materialization + fusion barrier; BENCHMARKS.md), so XLA
      stays the production default.
    * ``"auto"`` — XLA, except the shapes where the im2col-packed Pallas
      kernel measured ≥1.15× XLA standalone on v5e (bit-exact; see
      ``pallas_conv.IM2COL_WIN_SHAPES``), on TPU backends only.
    * ``"pallas"`` — the 27-tap manual-DMA kernel (historical; 0.4–0.95×).
    * ``"im2col"`` — the im2col kernel for every eligible 3³ conv.
    * ``"packed"`` — the tw-packed kernel (3-lane concat, 9 offset matmuls;
      fwd AND dx in Pallas) for every eligible 3³ conv.

    Select with ``PCRL_CONV3D=...``."""
    import os

    return os.environ.get("PCRL_CONV3D", "xla").lower()


def _on_tpu() -> bool:
    import jax

    return jax.default_backend() in ("tpu", "axon")


def _im2col_wins(x_shape, w_shape) -> bool:
    """True for (D,H,W,Ci,Co) where the im2col Pallas kernel measured ≥1.15×
    XLA (hardware numbers in BENCHMARKS.md)."""
    from pcrlv2_tpu.ops.pallas_conv import IM2COL_WIN_SHAPES

    return tuple(x_shape[1:4]) + (w_shape[3], w_shape[4]) in IM2COL_WIN_SHAPES


def conv3d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: int = 1,
    padding=None,
) -> jax.Array:
    """3D convolution, ``x`` NDHWC, ``w`` DHWIO.

    Equivalent of ``nn.Conv3d`` (reference ``pcrlv2_model_3d.py:9,78``).
    Output dtype follows ``x``; the MXU accumulates in f32.

    Under a spatial-sharding scope (``parallel.context``), 3³ stride-1 convs
    halo-exchange one boundary plane along the sharded leading spatial dim.
    """
    from pcrlv2_tpu.parallel.context import current_spatial_axis

    ax = current_spatial_axis()
    if ax is not None and stride == 1 and w.shape[:3] == (3, 3, 3) \
            and padding is None:
        from pcrlv2_tpu.parallel.spatial import conv3d_local

        return conv3d_local(x, w, b, axis_name=ax)
    impl = conv_impl()
    eligible = stride == 1 and w.shape[:3] == (3, 3, 3) and padding is None
    if eligible and w.shape[-1] == 1:
        from pcrlv2_tpu.ops.head_conv import (
            conv3d_co1_tapmajor,
            head_conv_impl,
        )

        if head_conv_impl() != "xla":
            out = conv3d_co1_tapmajor(x, w)
            if b is not None:
                out = out + b.astype(out.dtype)
            return out
    if impl == "pallas" and eligible:
        from pcrlv2_tpu.ops.pallas_conv import conv3d_pallas

        bias = (b if b is not None
                else jnp.zeros((w.shape[-1],), x.dtype)).reshape(-1)
        return conv3d_pallas(x, w, bias)
    if eligible and _on_tpu() and (
            impl == "im2col"
            or (impl == "auto" and _im2col_wins(x.shape, w.shape))):
        from pcrlv2_tpu.ops.pallas_conv import conv3d_im2col

        bias = (b if b is not None
                else jnp.zeros((w.shape[-1],), x.dtype)).reshape(-1)
        return conv3d_im2col(x, w, bias)
    if eligible and _on_tpu() and impl == "packed":
        from pcrlv2_tpu.ops.pallas_conv import conv3d_packed

        bias = (b if b is not None
                else jnp.zeros((w.shape[-1],), x.dtype)).reshape(-1)
        return conv3d_packed(x, w, bias)
    if padding is None:
        padding = _same_padding(w.shape[:3])
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,) * 3,
        padding=padding,
        dimension_numbers=DN_3D,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: int = 1,
    padding=None,
) -> jax.Array:
    """2D convolution, ``x`` NHWC, ``w`` HWIO (``nn.Conv2d`` equivalent)."""
    if padding is None:
        padding = _same_padding(w.shape[:2])
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,) * 2,
        padding=padding,
        dimension_numbers=DN_2D,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _convt_impl() -> str:
    """k==stride transpose-conv formulation: ``"einsum"`` (default; single
    matmul + reshape — measured 531 vs 714 ms/step at the b=32 operating
    point) or ``"dilated"`` (conv with lhs_dilation; its backward avoids the
    einsum's 8-D scatter intermediate, for memory-constrained configs).
    Select with ``PCRL_CONVT3D=dilated``."""
    import os

    return os.environ.get("PCRL_CONVT3D", "einsum").lower()


def conv_transpose3d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: int = 2,
) -> jax.Array:
    """Transpose 3D conv, ``x`` NDHWC, ``w`` DHWIO, torch semantics
    (``nn.ConvTranspose3d(k, stride)`` with ``padding=0``; reference
    ``pcrlv2_model_3d.py:52`` uses k=2, s=2).

    Fast path k == stride (non-overlapping): a single einsum/matmul —
    ``out[b, s·d+i, s·h+j, s·w+k, o] = Σ_c x[b,d,h,w,c] · w[i,j,k,c,o]``.
    General case: fractionally-strided conv (lhs_dilation) with a spatially
    flipped kernel.
    """
    kd, kh, kw = w.shape[:3]
    if (kd, kh, kw) == (stride,) * 3 and _convt_impl() == "einsum":
        # one MXU matmul + reshape — fastest end-to-end at the operating
        # point; PCRL_CONVT3D=dilated picks the memory-friendlier backward.
        bsz, d, h, wd, _ = x.shape
        co = w.shape[-1]
        out = jnp.einsum("bdhwc,ijkco->bdihjwko", x, w.astype(x.dtype))
        out = out.reshape(bsz, d * stride, h * stride, wd * stride, co)
    else:
        pad = [(k - 1, k - 1) for k in (kd, kh, kw)]
        out = lax.conv_general_dilated(
            x,
            jnp.flip(w, (0, 1, 2)).astype(x.dtype),
            window_strides=(1, 1, 1),
            padding=pad,
            lhs_dilation=(stride,) * 3,
            dimension_numbers=DN_3D,
        )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def depthwise_conv3d(x: jax.Array, w: jax.Array, *, padding=None) -> jax.Array:
    """Depthwise 3D conv (used by on-device Gaussian blur).

    ``x`` NDHWC, ``w`` (kd, kh, kw, 1, C) — one filter per channel.
    """
    c = x.shape[-1]
    if padding is None:
        padding = _same_padding(w.shape[:3])
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1, 1),
        padding=padding,
        dimension_numbers=DN_3D,
        feature_group_count=c,
    )
    return out


def depthwise_conv2d(x: jax.Array, w: jax.Array, *, padding=None) -> jax.Array:
    """Depthwise 2D conv (Gaussian blur / PIL ``ImageFilter.GaussianBlur``
    replacement, reference ``utils.py:139-148``).  ``w`` (kh, kw, 1, C)."""
    c = x.shape[-1]
    if padding is None:
        padding = _same_padding(w.shape[:2])
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=DN_2D,
        feature_group_count=c,
    )
    return out
