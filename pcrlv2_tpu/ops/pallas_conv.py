"""Pallas TPU kernels for 3×3×3 conv3d — forward, input-grad and filter-grad.

The reference's hot op is cuDNN ``nn.Conv3d(k=3, padding=1)``
(``pcrlv2_model_3d.py:9``); SURVEY.md §2.2 names its TPU re-owning as the
north-star Pallas target.  Design:

* **27-tap matmul formulation.**  With channels last, a 3³ SAME conv is
  ``out[b,d,h,w,o] = Σ_{t∈3³} x[b, d+td−1, h+th−1, w+tw−1, :] @ W[t]`` —
  27 MXU matmuls of shape (H·W, Ci) @ (Ci, Co) per (batch, depth) program,
  accumulated in an f32 VMEM scratch.  No im2col materialization: each tap
  is a static slice of one haloed slab already in VMEM.
* **Grid (B, D, Co-tiles).**  The input stays in HBM (``pltpu.ANY``); each
  program DMAs its (3, H+2, W+2, Ci) slab into VMEM scratch once and reuses
  it for all 27 taps.  Co is tiled so the largest layer's weights
  (27·512·512) never exceed VMEM.
* **Backward as two more Pallas kernels.**  dx is the same forward kernel on
  the spatially-flipped, io-transposed weights (SAME 3³ conv is self-adjoint
  under that transform); dw is a tap-indexed reduction kernel — grid
  (27·Ci-tiles, B, D), each step one (Ci, H·W) @ (H·W, Co) matmul
  accumulated into the revisited (Ci, Co) output block.

``conv3d_pallas`` carries a ``jax.custom_vjp`` wiring all three together.
XLA's native conv remains the default path (``ops.convolution``); this kernel
is selected per-shape via ``ops.conv_impl`` / the ``PCRL_CONV3D`` env var, and
both paths are numerics-tested against each other (``tests/test_pallas_conv.py``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 3  # kernel edge — the only 3D conv size the models use


def _co_tile(ci: int, co: int, h: int, w: int, in_bytes: int) -> int:
    """Pick a Co tile keeping weights + slab + accumulator well under VMEM."""
    budget = 10 * 1024 * 1024
    slab = 3 * (h + 2) * (w + 2) * ci * in_bytes
    for tile in (co, 256, 128, 64, 32, 16, 8):
        if tile > co or co % tile:
            continue
        weights = 27 * ci * tile * in_bytes
        acc = h * w * tile * 4
        if slab + weights + 2 * acc <= budget:
            return tile
    return min(co, 8)


def _fwd_kernel(x_hbm, w_ref, b_ref, out_ref, slab, acc, sem):
    """One (batch, depth, co-tile) program of the 27-tap forward conv."""
    b = pl.program_id(0)
    d = pl.program_id(1)
    h_out, w_out = out_ref.shape[2], out_ref.shape[3]

    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(d, 3)], slab, sem)
    cp.start()
    cp.wait()

    acc[...] = jnp.broadcast_to(
        b_ref[0].astype(jnp.float32), (h_out * w_out, b_ref.shape[1]))
    for td in range(K):
        for th in range(K):
            for tw in range(K):
                window = slab[td, th:th + h_out, tw:tw + w_out, :]
                lhs = window.reshape(h_out * w_out, slab.shape[-1])
                tap = td * 9 + th * 3 + tw
                acc[...] += jnp.dot(lhs, w_ref[tap],
                                    preferred_element_type=jnp.float32)
    out_ref[0, 0] = acc[...].reshape(
        h_out, w_out, out_ref.shape[-1]).astype(out_ref.dtype)


def _conv3d_fwd(x: jax.Array, w: jax.Array, bias: jax.Array) -> jax.Array:
    """SAME 3³ conv, x (B, D, H, W, Ci) NDHWC, w (3, 3, 3, Ci, Co)."""
    bsz, d, h, wd, ci = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    wmat = w.astype(x.dtype).reshape(27, ci, co)
    tile = _co_tile(ci, co, h, wd, x.dtype.itemsize)

    return pl.pallas_call(
        _fwd_kernel,
        grid=(bsz, d, co // tile),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded x stays in HBM
            pl.BlockSpec((27, ci, tile), lambda b, i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda b, i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h, wd, tile),
                               lambda b, i, j: (b, i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, d, h, wd, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, h + 2, wd + 2, ci), x.dtype),
            pltpu.VMEM((h * wd, tile), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * d * h * wd * 27 * ci * co,
            bytes_accessed=(xp.size + w.size) * x.dtype.itemsize
            + bsz * d * h * wd * co * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, wmat, bias.astype(x.dtype).reshape(1, co))


def _dw_kernel(xpad_hbm, g_hbm, dw_ref, xslab, gslab, acc, sems):
    """Filter-grad: grid (27, B, D); accumulates (Ci, Co) per tap.

    dw[t][ci, co] = Σ_{b,d} xpad[b, d+td, th:th+H, tw:tw+W, ci]ᵀ· g[b, d, :, :, co]
    The output block depends only on the tap index, so successive (b, d)
    steps revisit and accumulate into it (TPU grids iterate sequentially).
    """
    t = pl.program_id(0)
    b = pl.program_id(1)
    d = pl.program_id(2)
    td = t // 9
    th = (t // 3) % 3
    tw = t % 3
    h_out, w_out = gslab.shape[1], gslab.shape[2]

    cx = pltpu.make_async_copy(xpad_hbm.at[b, pl.ds(d + td, 1)], xslab,
                               sems.at[0])
    cg = pltpu.make_async_copy(g_hbm.at[b, pl.ds(d, 1)], gslab, sems.at[1])
    cx.start()
    cg.start()
    cx.wait()
    cg.wait()

    @pl.when(jnp.logical_and(b == 0, d == 0))
    def _():
        acc[...] = jnp.zeros_like(acc)

    window = jax.lax.dynamic_slice(
        xslab[0], (th, tw, 0), (h_out, w_out, xslab.shape[-1]))
    lhs = window.reshape(h_out * w_out, xslab.shape[-1])
    rhs = gslab[0].reshape(h_out * w_out, gslab.shape[-1])
    acc[...] += jax.lax.dot_general(
        lhs, rhs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(b == pl.num_programs(1) - 1,
                             d == pl.num_programs(2) - 1))
    def _():
        dw_ref[0] = acc[...]


def _conv3d_dw(x: jax.Array, g: jax.Array) -> jax.Array:
    """Filter gradient: x (B,D,H,W,Ci), g (B,D,H,W,Co) → (3,3,3,Ci,Co) f32."""
    bsz, d, h, wd, ci = x.shape
    co = g.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))

    dw = pl.pallas_call(
        _dw_kernel,
        grid=(27, bsz, d),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, ci, co), lambda t, b, i: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((27, ci, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, h + 2, wd + 2, ci), x.dtype),
            pltpu.VMEM((1, h, wd, co), g.dtype),
            pltpu.VMEM((ci, co), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * d * h * wd * 27 * ci * co,
            bytes_accessed=27 * (xp.size + g.size) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, g)
    return dw.reshape(3, 3, 3, ci, co)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def conv3d_pallas(x: jax.Array, w: jax.Array, bias: jax.Array) -> jax.Array:
    """SAME 3³ Pallas conv (NDHWC · DHWIO + bias), custom fwd/bwd kernels."""
    return _conv3d_fwd(x, w, bias)


def _vjp_fwd(x, w, bias):
    return _conv3d_fwd(x, w, bias), (x, w)


def _vjp_bwd(res, g):
    x, w = res
    # dx: correlate g with the spatially-flipped, io-swapped kernel —
    # SAME 3³ conv's adjoint is the same kernel shape on transformed weights.
    w_t = jnp.flip(w, (0, 1, 2)).swapaxes(3, 4)
    dx = _conv3d_fwd(g, w_t.astype(g.dtype),
                     jnp.zeros((w.shape[3],), g.dtype)).astype(x.dtype)
    dw = _conv3d_dw(x, g).astype(w.dtype)
    db = jnp.sum(g, axis=(0, 1, 2, 3)).astype(g.dtype)
    return dx, dw, db


conv3d_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def conv3d_reference(x, w, bias):
    """lax reference for numerics tests."""
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out + bias.astype(out.dtype)
