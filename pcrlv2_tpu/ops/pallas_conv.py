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

Measured verdict (v5e, b=32, bf16; see BENCHMARKS.md): correct fwd+bwd on
hardware, 0.4–0.95× XLA's conv across the model's shapes — XLA stays the
default.  The gap is (a) channel padding to the 128-lane tile for manual DMA
alignment (4× HBM read amplification at Ci=32) and (b) no DMA/compute
double-buffering yet; the kernel is the foundation for fused conv+BN+act
variants where XLA cannot fuse.

Hardware lowering notes (all empirically verified on v5e):
* manual HBM→VMEM DMA slices must be tile-aligned — 8 sublanes on the
  second-to-minor dim, 128 lanes on the minor dim (hence the W/Ci padding);
* value-level ``lax.dynamic_slice`` has no Mosaic lowering — dynamic windows
  use ``lax.switch`` over static slices;
* ``pltpu.roll`` mis-lowers dynamic shifts on 3D values / tall 2D shapes
  (returns data offset by whole tiles) — avoided entirely.
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


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _co_tile(ci: int, co: int, h: int, w: int, in_bytes: int) -> int:
    """Pick a Co tile keeping weights + slab + accumulator well under VMEM."""
    budget = 10 * 1024 * 1024
    slab = 3 * (h + 2) * _round_up(w + 2, 8) * ci * in_bytes
    for tile in (co, 256, 128, 64, 32, 16, 8):
        if tile > co or co % tile:
            continue
        weights = 27 * ci * tile * in_bytes
        acc = h * _round_up(w + 2, 8) * tile * 4
        if slab + weights + 2 * acc <= budget:
            return tile
    return min(co, 8)


def _fwd_kernel(x_hbm, w_ref, b_ref, out_ref, slab, acc, sem):
    """One (batch, depth, co-tile) program of the 27-tap forward conv.

    W is padded to the 8-sublane tile (Mosaic requires DMA slice shapes
    aligned on the second-to-minor dim); pad columns carry zeros and the
    corresponding output columns are sliced off by the caller.
    """
    b = pl.program_id(0)
    d = pl.program_id(1)
    h_out, wp = out_ref.shape[2], out_ref.shape[3]

    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(d, 3)], slab, sem)
    cp.start()
    cp.wait()

    acc[...] = jnp.broadcast_to(
        b_ref[0].astype(jnp.float32), (h_out * wp, b_ref.shape[1]))
    for td in range(K):
        for th in range(K):
            for tw in range(K):
                window = slab[td, th:th + h_out, tw:tw + wp, :]
                lhs = window.reshape(h_out * wp, slab.shape[-1])
                tap = td * 9 + th * 3 + tw
                acc[...] += jnp.dot(lhs, w_ref[tap],
                                    preferred_element_type=jnp.float32)
    out_ref[0, 0] = acc[...].reshape(
        h_out, wp, out_ref.shape[-1]).astype(out_ref.dtype)


def _conv3d_fwd(x: jax.Array, w: jax.Array, bias: jax.Array) -> jax.Array:
    """SAME 3³ conv, x (B, D, H, W, Ci) NDHWC, w (3, 3, 3, Ci, Co).

    Manual HBM→VMEM DMAs must be tile-aligned: W (second-to-minor) to the
    8-sublane tile, Ci (minor) to the 128-lane tile.  Both pads carry zeros —
    free on the MXU, whose systolic array is 128 deep regardless of K.
    """
    bsz, d, h, wd, ci = x.shape
    co = w.shape[-1]
    wp = _round_up(wd, 8)
    ws = _round_up(wp + 2, 8)
    cip = _round_up(ci, 128)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, ws - 1 - wd),
                     (0, cip - ci)))
    wmat = jnp.pad(w.astype(x.dtype), ((0, 0),) * 3 + ((0, cip - ci), (0, 0))
                   ).reshape(27, cip, co)
    tile = _co_tile(cip, co, h, wp, x.dtype.itemsize)

    out = pl.pallas_call(
        _fwd_kernel,
        grid=(bsz, d, co // tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # padded x stays in HBM
            pl.BlockSpec((27, cip, tile), lambda b, i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda b, i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h, wp, tile),
                               lambda b, i, j: (b, i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, d, h, wp, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, h + 2, ws, cip), x.dtype),
            pltpu.VMEM((h * wp, tile), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * d * h * wp * 27 * ci * co,
            bytes_accessed=(xp.size + w.size) * x.dtype.itemsize
            + bsz * d * h * wp * co * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, wmat, bias.astype(x.dtype).reshape(1, co))
    return out[:, :, :, :wd, :]


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
    h_out, w_out = gslab.shape[1], gslab.shape[2]  # w_out is the padded width

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

    # (th, tw) window via lax.switch over the 9 static slices.  Dynamic
    # alternatives are unavailable here: value-level dynamic_slice has no
    # Mosaic lowering, and pltpu.roll mis-lowers dynamic shifts at these
    # shapes (verified empirically: axis-0 rolls of 3D values and rolls of
    # (160, 128) return data offset by whole tiles).
    cip = xslab.shape[3]

    def mk_branch(th_s, tw_s):
        def branch(v):
            return v[th_s:th_s + h_out, tw_s:tw_s + w_out, :]
        return branch

    window = jax.lax.switch(
        th * 3 + tw,
        [mk_branch(a, c) for a in range(3) for c in range(3)],
        xslab[0])
    lhs = window.reshape(h_out * w_out, cip)
    rhs = gslab[0].reshape(h_out * w_out, gslab.shape[-1])
    acc[...] += jax.lax.dot_general(
        lhs, rhs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(b == pl.num_programs(1) - 1,
                             d == pl.num_programs(2) - 1))
    def _():
        dw_ref[0] = acc[...]


def _conv3d_dw(x: jax.Array, g: jax.Array) -> jax.Array:
    """Filter gradient: x (B,D,H,W,Ci), g (B,D,H,W,Co) → (3,3,3,Ci,Co) f32.

    W padded to the 8-sublane tile on both operands (alignment, see
    ``_conv3d_fwd``); padded g columns are zero so they add nothing.
    """
    bsz, d, h, wd, ci = x.shape
    co = g.shape[-1]
    wp = _round_up(wd, 8)
    ws = _round_up(wp + 2, 8)
    cip = _round_up(ci, 128)
    cop = _round_up(co, 128)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, ws - 1 - wd),
                     (0, cip - ci)))
    g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, wp - wd), (0, cop - co)))

    dw = pl.pallas_call(
        _dw_kernel,
        grid=(27, bsz, d),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, cip, cop), lambda t, b, i: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((27, cip, cop), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, h + 2, ws, cip), x.dtype),
            pltpu.VMEM((1, h, wp, cop), g.dtype),
            pltpu.VMEM((cip, cop), jnp.float32),
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
    return dw[:, :ci, :co].reshape(3, 3, 3, ci, co)


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


# ---------------------------------------------------------------------------
# im2col-packed forward kernel (v2) — beats XLA on select shapes
# ---------------------------------------------------------------------------
#
# XLA's conv contracts only Ci per tap, so layers with Ci < 128 run at
# ~Ci/128 of the MXU rate.  This kernel lane-concatenates all 27 tap windows
# (each reshaped to 2D (H·W, Ci) — the 3D concat has no Mosaic lowering)
# into one (H·W, 27·Ci) operand and performs a single matmul with ~96 %
# contraction packing.  The VPU concat costs real time, so it only wins when
# the matmul is wide enough to amortize it — measured on v5e b=32 (bf16,
# bit-exact vs XLA): (32,32,16) 64→128 at 1.21×, (16,16,8) 128→128 at 1.30×;
# 0.7–0.95× elsewhere (BENCHMARKS.md).  ``conv3d`` dispatches it for the
# measured-win shapes only.

#: (D, H, W, Ci, Co) shapes where the im2col kernel measured ≥1.15× XLA.
IM2COL_WIN_SHAPES = frozenset({
    (32, 32, 16, 64, 128),   # encoder d1-ops1 at the LUNA operating point
    (16, 16, 8, 128, 128),   # encoder d2-ops0
})


def _im2col_kernel(x0, x1, x2, w_ref, b_ref, out_ref, acc):
    h_out, w_out = out_ref.shape[2], out_ref.shape[3]
    ci = x0.shape[-1]
    hw = h_out * w_out

    acc[...] = jnp.broadcast_to(
        b_ref[0].astype(jnp.float32), (hw, out_ref.shape[-1]))
    planes = (x0, x1, x2)
    cols = jnp.concatenate(
        [planes[td][0, 0, th:th + h_out, tw:tw + w_out, :].reshape(hw, ci)
         for td in range(3) for th in range(3) for tw in range(3)], axis=-1)
    acc[...] += jnp.dot(cols, w_ref[0], preferred_element_type=jnp.float32)
    out_ref[0, 0] = acc[...].reshape(
        h_out, w_out, out_ref.shape[-1]).astype(out_ref.dtype)


def _im2col_fwd(x: jax.Array, w: jax.Array, bias: jax.Array) -> jax.Array:
    bsz, d, h, wd, ci = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    wmat = w.astype(x.dtype).reshape(1, 27 * ci, co)

    def xspec(k):
        # three depth-shifted streams of the same padded array give the
        # overlapping halo; Mosaic double-buffers each stream automatically
        return pl.BlockSpec((1, 1, h + 2, wd + 2, ci),
                            lambda b, dd, k=k: (b, dd + k, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _im2col_kernel,
        grid=(bsz, d),
        in_specs=[xspec(0), xspec(1), xspec(2),
                  pl.BlockSpec((1, 27 * ci, co), lambda b, dd: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, co), lambda b, dd: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, h, wd, co),
                               lambda b, dd: (b, dd, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, d, h, wd, co), x.dtype),
        scratch_shapes=[pltpu.VMEM((h * wd, co), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * d * h * wd * 27 * ci * co,
            bytes_accessed=3 * xp.size * x.dtype.itemsize
            + bsz * d * h * wd * co * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, xp, xp, wmat, bias.astype(x.dtype).reshape(1, co))


# ---------------------------------------------------------------------------
# tw-packed forward kernel (v3) — 3-way lane packing, 9 offset matmuls
# ---------------------------------------------------------------------------
#
# The im2col kernel (above) showed the trade: 27-way lane-concat buys 96 %
# contraction packing but costs 27 VPU slab copies — a net loss at Co=64.
# This kernel packs only the minor spatial (tw) taps: 3 lane-concats build
# ``packed[d] = [x[d,:,0:W] | x[d,:,1:W+1] | x[d,:,2:W+2]]`` (H+2, W, 3·Ci)
# per depth stream, and the (td, th) taps become NINE row-offset windows of
# those three buffers — ``packed[td][th:th+H]`` reshaped (H·W, 3Ci) — because
# an h-shift is a row shift of the flattened (H, W) grid.  Zero extra data
# movement for 9 of the 27 taps' worth of windows.
#
# Contraction: 3·Ci lanes — Ci=32 → 96/128 = 75 % packed (vs XLA's 25 %),
# Ci=64 → 192/256 = 75 % (vs 50 %), at 1/3 the VPU concat traffic of im2col.
# Weights are trace-time rearranged to 9 blocks of (3·Ci, Co):
# ``w9[td*3+th] = concat(w[td,th,0], w[td,th,1], w[td,th,2], axis=Ci)``.


def _packed_kernel(x0, x1, x2, w_ref, b_ref, out_ref, acc):
    h_out, w_out = out_ref.shape[2], out_ref.shape[3]
    ci = x0.shape[-1]
    hw = h_out * w_out

    acc[...] = jnp.broadcast_to(
        b_ref[0].astype(jnp.float32), (hw, out_ref.shape[-1]))
    for td, xs in enumerate((x0, x1, x2)):
        plane = xs[0, 0]  # (H+2, W+2, Ci)
        # 2D lane-concat only — the 3D-value concat has no Mosaic lowering
        # (module docstring).  After flattening (H+2, W) into rows, an
        # h-shift is a row offset of th·W, so the 9 (td, th) windows are
        # row-offset slices of three packed buffers.
        packed = jnp.concatenate(
            [plane[:, tw:tw + w_out, :].reshape((h_out + 2) * w_out, ci)
             for tw in range(3)], axis=-1)  # ((H+2)·W, 3Ci)
        for th in range(3):
            window = packed[th * w_out: th * w_out + hw]
            acc[...] += jnp.dot(window, w_ref[td * 3 + th],
                                preferred_element_type=jnp.float32)
    out_ref[0, 0] = acc[...].reshape(
        h_out, w_out, out_ref.shape[-1]).astype(out_ref.dtype)


def _packed_fwd(x: jax.Array, w: jax.Array, bias: jax.Array) -> jax.Array:
    bsz, d, h, wd, ci = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    # w (3,3,3,Ci,Co) → 9 × (3Ci, Co): block g=td*3+th stacks the tw taps
    # tw-major over Ci — exactly the packed operand's lane order.
    w9 = w.astype(x.dtype).reshape(9, 3 * ci, co)

    def xspec(k):
        return pl.BlockSpec((1, 1, h + 2, wd + 2, ci),
                            lambda b, dd, k=k: (b, dd + k, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _packed_kernel,
        grid=(bsz, d),
        in_specs=[xspec(0), xspec(1), xspec(2),
                  pl.BlockSpec((9, 3 * ci, co), lambda b, dd: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, co), lambda b, dd: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, h, wd, co),
                               lambda b, dd: (b, dd, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, d, h, wd, co), x.dtype),
        scratch_shapes=[pltpu.VMEM((h * wd, co), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * d * h * wd * 27 * ci * co,
            bytes_accessed=3 * xp.size * x.dtype.itemsize
            + bsz * d * h * wd * co * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, xp, xp, w9, bias.astype(x.dtype).reshape(1, co))


@jax.custom_vjp
def conv3d_packed(x: jax.Array, w: jax.Array, bias: jax.Array) -> jax.Array:
    """SAME 3³ conv: tw-packed Pallas forward AND input-grad (the adjoint of
    a SAME 3³ conv is the same conv on flipped/io-swapped weights, so dx
    reuses the packed kernel and inherits its contraction packing);
    filter-grad stays on XLA's transpose (spatial contraction — already
    fully packed there)."""
    return _packed_fwd(x, w, bias)


def _packed_vjp_fwd(x, w, bias):
    return _packed_fwd(x, w, bias), (x, w, jnp.zeros((0,), bias.dtype))


def _packed_vjp_bwd(res, g):
    x, w, bias_proto = res
    w_t = jnp.flip(w, (0, 1, 2)).swapaxes(3, 4)
    dx = _packed_fwd(g, w_t.astype(g.dtype),
                     jnp.zeros((w.shape[3],), g.dtype)).astype(x.dtype)

    def conv_w(w_):
        return jax.lax.conv_general_dilated(
            x, w_, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    dw = jax.linear_transpose(conv_w, w.astype(x.dtype))(g)[0].astype(w.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2, 3)).astype(
        bias_proto.dtype)
    return dx, dw, db


conv3d_packed.defvjp(_packed_vjp_fwd, _packed_vjp_bwd)


@jax.custom_vjp
def conv3d_im2col(x: jax.Array, w: jax.Array, bias: jax.Array) -> jax.Array:
    """SAME 3³ conv: Pallas im2col forward, lax-transpose backward (the
    backward shapes aren't in the kernel's win set, so XLA keeps them)."""
    return _im2col_fwd(x, w, bias)


def _im2col_vjp_fwd(x, w, bias):
    # residuals must be jax types — an empty array carries the bias dtype
    return _im2col_fwd(x, w, bias), (x, w, jnp.zeros((0,), bias.dtype))


def _im2col_vjp_bwd(res, g):
    x, w, bias_proto = res
    bias_dtype = bias_proto.dtype

    def conv_x(x_):
        return jax.lax.conv_general_dilated(
            x_, w.astype(x.dtype), (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def conv_w(w_):
        return jax.lax.conv_general_dilated(
            x, w_, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    dx = jax.linear_transpose(conv_x, x)(g)[0]
    dw = jax.linear_transpose(conv_w, w.astype(x.dtype))(g)[0].astype(w.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2, 3)).astype(bias_dtype)
    return dx, dw, db


conv3d_im2col.defvjp(_im2col_vjp_fwd, _im2col_vjp_bwd)
