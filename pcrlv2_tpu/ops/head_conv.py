"""Tap-major formulation of the Co=1 3³ conv (deep-supervision mask heads).

The 3D model's per-level ``deep_supervision_head`` is a ``Conv3d(C→1, k=3)``
(reference ``pcrlv2_model_3d.py:60,71``).  XLA lowers the 64³-spatial instance
as a dense conv with the single output channel padded to the 128-lane tile —
a 1.86 TFLOP 64→128 conv, ~11-13 ms in-program per global forward plus a
similar backward (BENCHMARKS.md "Co=1 mask-head reformulations"), the largest
non-skeleton cost left in the fused step.

This module contracts the channels FIRST, where the MXU is efficient, and
only then combines the 27 taps with static shifted-slice adds that XLA
loop-fuses:

    y[b,z,y,x,t] = Σ_c  x[b,z,y,x,c] · K[c,t]          (one (N,Ci)@(Ci,27) matmul)
    out[b,p]     = Σ_t  y[b, p + off_t - 1, t]          (27 static slices, f32 acc)

where ``K[c, t]`` is the kernel with its 27 spatial taps flattened tap-major
(t = 9·dz + 3·dy + dx) and ``off_t = (dz, dy, dx)``.  The matmul executes
~27× fewer (padded) MXU FLOPs than XLA's channel-padded conv; the combine is
memory-bound on the small Co=1 output.

The backward pass uses the same trick in reverse (``custom_vjp``):

    g27[b,q,t] = g[b, q - off_t + 1]                    (27 shifted slices)
    dx         = g27 @ Kᵀ                               ((N,27)@(27,Ci) matmul)
    dK[c,t]    = Σ_n x[n,c] · g27[n,t]                  ((Ci,N)@(N,27) matmul)

Two layouts for the intermediate (selected by ``PCRL_HEADCONV``):

* ``tapA`` — keep ``t`` as a trailing 27-wide dim.  Simple, but the minor dim
  pads to the 128-lane tile in TPU memory (≈4.7× footprint on the
  intermediate).
* ``tapD`` — reshape to ``(B, D, H, W·27)`` so lanes are ~97 % packed; the
  combine then reads strided lane slices.
* ``tapP`` — a Pallas kernel that never materializes the intermediate in
  HBM: per (batch, depth) program it streams the three depth planes
  (halo via depth-shifted block streams, the ``pallas_conv._im2col_fwd``
  pattern), runs one ``(hw, Ci) @ (Ci, 9)`` MXU dot per depth plane and
  accumulates the three in f32 (folding the td taps into the sum), then
  does the 9-way (th, tw) shifted combine in VMEM — HBM traffic is the
  x read + the Co=1 output write, the formulation's floor.
* a trailing ``x`` (``tapAx``/``tapDx``/``tapPx``) keeps the tap-major
  forward but XLA's own conv backward.

Default is ``xla`` (the padded dense conv) — the round-3 hardware A/B
measured tapA/tapD 2.1× faster *standalone* but 2-8 % slower inside the
fused train step (XLA overlaps the dense head with neighboring HBM-bound
ops; see BENCHMARKS.md), and tapP/tapPx fail Mosaic scoped-VMEM allocation
at the production batch.  The family stays as env-var opt-ins:
``PCRL_HEADCONV=<variant>``.

Numerics: the channel contraction accumulates in f32 on the MXU exactly like
the dense conv; the only difference is one extra rounding of the per-tap
partials to the compute dtype before the f32 tap sum.  In f32 the two paths
agree to ~1e-6 (pinned by ``tests/test_ops.py``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: tap index t = 9·dz + 3·dy + dx — row-major order of w.reshape(27, Ci)
OFFSETS = [(dz, dy, dx) for dz in range(3) for dy in range(3)
           for dx in range(3)]


def head_conv_impl() -> str:
    """``PCRL_HEADCONV``: ``xla`` (default), ``tapA``, ``tapD``, or the
    mixed ``tapAx``/``tapDx`` (tap-major forward, XLA conv backward)."""
    return os.environ.get("PCRL_HEADCONV", "xla")


def _flatten_kernel(w: jax.Array, dtype) -> jax.Array:
    """(3,3,3,Ci,1) DHWIO kernel → (Ci, 27) tap-major columns."""
    ci = w.shape[3]
    return w.reshape(27, ci).T.astype(dtype)


def _combine_taps_a(y: jax.Array) -> jax.Array:
    """Σ_t of shifted slices of ``y`` (B,D,H,W,27), f32 accumulation."""
    b, d, h, wd, _ = y.shape
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    out = None
    for t, (dz, dy, dx) in enumerate(OFFSETS):
        s = yp[:, dz:dz + d, dy:dy + h, dx:dx + wd, t].astype(jnp.float32)
        out = s if out is None else out + s
    return out


def _combine_taps_d(y: jax.Array) -> jax.Array:
    """Same combine with the 27 taps packed into the lane dim (W·27)."""
    b, d, h, wd, _ = y.shape
    yl = y.reshape(b, d, h, wd * 27)
    yp = jnp.pad(yl, ((0, 0), (1, 1), (1, 1), (27, 27)))
    out = None
    for t, (dz, dy, dx) in enumerate(OFFSETS):
        s = lax.slice(
            yp, (0, dz, dy, dx * 27 + t),
            (b, dz + d, dy + h, dx * 27 + t + (wd - 1) * 27 + 1),
            (1, 1, 1, 27)).astype(jnp.float32)
        out = s if out is None else out + s
    return out


def _fwd_row_band(h_out: int, w_out: int, dtype=None) -> int:
    """Rows of output computed per in-kernel iteration.

    The forward's f32 intermediates are 9 wide and therefore pad to the
    128-lane tile: at the 64³ level the full-plane ``(66·66, 9)`` dot result
    occupies 66·66·128·4 B ≈ 2.2 MB per live buffer, and Mosaic's scoped-VMEM
    stack hit 16.50 M vs the 16 M budget (the round-3 compile FAIL,
    BENCHMARKS.md).  Banding the plane into row strips bounds each
    intermediate at ``(hb+2)·(w_out+2)`` rows (~600 KB at hb=16, w=64) while
    the x halo streams stay whole-plane (0.56 MB each — cheap)."""
    env = os.environ.get("PCRL_HEADCONV_HB")
    if env:  # measurement knob: force a band height (0 = whole plane)
        hb = int(env)
        return h_out if hb <= 0 or h_out % hb else hb
    if (h_out + 2) * (w_out + 2) <= 24 * 66:
        return h_out  # small level: one band
    # hardware-measured at the 64² plane (f32, whole-plane halo streams
    # ≈13.7M fixed): hb=8 hits 16.73M > the 16M budget, hb=4 fits — the
    # per-band f32 intermediates cost ≈0.37M per row.  bf16 stores into the
    # rank-4 out block need the dynamic row offset sublane-aligned (Mosaic
    # "multiple of 8"), so bf16 bands are 8 rows — the halved input streams
    # pay for the bigger band.
    ladder = (4, 2) if dtype is None or dtype == jnp.float32 else (8, 16)
    for hb in ladder:
        if h_out % hb == 0:
            return hb
    return h_out  # odd height: no banding (shapes this size all divide)


def _pallas_kernel(x0, x1, x2, w_ref, out_ref):
    """One (batch, depth) program: one MXU dot per depth plane folding the
    td taps into the contraction (accumulated in f32 — no packed
    ``(hw2, 3Ci)`` copy), 9-way shifted combine in VMEM, row-banded to fit
    the 16M scoped-VMEM budget (``_fwd_row_band``).  HBM traffic is x-read +
    out-write only."""
    h_out, w_out = out_ref.shape[2], out_ref.shape[3]
    ci = x0.shape[-1]
    hb = _fwd_row_band(h_out, w_out, out_ref.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 9), 2)
    rows = hb + 2
    hw2 = rows * (w_out + 2)
    # out_ref is rank-4 (no trailing Co=1): a (…, 1) block pads its minor dim
    # to the 128-lane tile — 2 MB instead of 16 KB at the 64² plane, and the
    # block is double-buffered.  The caller re-adds the channel axis.

    # fori_loop (NOT a Python loop): unrolled bands each get their own slot
    # on Mosaic's scoped-VMEM stack — the unrolled form measured 17.96M at
    # the 64³ level, WORSE than the unbanded 16.50M.  A real loop keeps
    # exactly one band's intermediates live.
    def band(i, carry):
        # the alignment hint lets Mosaic prove the rank-4 out store's row
        # offset is sublane-tile-aligned
        r0 = pl.multiple_of(i * hb, hb)
        # y[p, th·3+tw] = Σ_td Σ_c plane_td[p, c] · w[td, th, tw, c]
        y = None
        for td, p in enumerate((x0, x1, x2)):
            bx = p[0, 0, pl.ds(r0, rows)].reshape(hw2, ci)
            part = jnp.dot(bx, w_ref[0, td * ci:(td + 1) * ci],
                           preferred_element_type=jnp.float32)
            y = part if y is None else y + part
        y3 = y.reshape(rows, w_out + 2, 9)
        acc = None
        for th in range(3):
            for tw in range(3):
                window = y3[th:th + hb, tw:tw + w_out, :]
                s = jnp.sum(jnp.where(lane == th * 3 + tw, window, 0.0),
                            axis=-1)
                acc = s if acc is None else acc + s
        out_ref[0, 0, pl.ds(r0, hb)] = acc.astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, h_out // hb, band, 0)


def _pallas_fwd(x: jax.Array, w: jax.Array) -> jax.Array:
    bsz, d, h, wd, ci = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    # (3Ci, 9): row c + td·Ci, column th·3+tw — td-major rows: the kernel
    # slices rows td*Ci:(td+1)*Ci for depth tap td
    wmat = jnp.transpose(w.reshape(3, 9, ci), (0, 2, 1)).reshape(
        1, 3 * ci, 9).astype(x.dtype)

    def xspec(k):
        # three depth-shifted streams of the same padded array carry the
        # halo; Mosaic double-buffers each stream (same pattern as
        # pallas_conv._im2col_fwd)
        return pl.BlockSpec((1, 1, h + 2, wd + 2, ci),
                            lambda b, dd, k=k: (b, dd + k, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _pallas_kernel,
        grid=(bsz, d),
        in_specs=[xspec(0), xspec(1), xspec(2),
                  pl.BlockSpec((1, 3 * ci, 9), lambda b, dd: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, h, wd),
                               lambda b, dd: (b, dd, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, d, h, wd), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * d * h * wd * 27 * ci,
            bytes_accessed=3 * xp.size * x.dtype.itemsize
            + bsz * d * h * wd * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(xp, xp, xp, wmat)
    return out[..., None]


def _pallas_bwd_kernel(x_blk, g0, g1, g2, k_ref, dx_ref, dw_ref, dw_acc):
    """One (batch, depth) program of the fused head backward.

    dx[q, c] = Σ_t g(q - off_t + 1) · K[c, t]   (27 VPU broadcast-FMAs)
    dK[c, t] = Σ_q x[q, c] · g(q - off_t + 1)   (27 (Ci,hw)@(hw,1) dots,
                                                 accumulated across the grid)
    Stream k carries gp[b, d + k] = g[b, d + k - 1], so tap td reads stream
    2 - td; within a plane tap (th, tw) reads the (2-th, 2-tw) window.
    """
    b = pl.program_id(0)
    d = pl.program_id(1)
    h_out, w_out = dx_ref.shape[2], dx_ref.shape[3]
    ci = x_blk.shape[-1]

    @pl.when(jnp.logical_and(b == 0, d == 0))
    def _():
        dw_acc[...] = jnp.zeros_like(dw_acc)

    # row-banded like the forward: each (hw, 1) window pads its minor dim to
    # the 128-lane tile (2 MB at the 64² plane), and 27 of them flow through
    # the loop — a fori_loop band (one band's buffers live at a time) bounds
    # every f32 intermediate at hb rows
    hb = _fwd_row_band(h_out, w_out)
    hw = hb * w_out

    def band(i, carry):
        r0 = i * hb
        x2d = x_blk[0, 0, pl.ds(r0, hb)].reshape(hw, ci)
        dx = None
        for t, (td, th, tw) in enumerate(OFFSETS):
            # NOTE: the g streams must stay rank-5 with the trailing Co=1 as
            # the LANE dim — the (hw, 1) window reshape is layout-trivial
            # from a lane-1 source, while from a squeezed rank-4 block
            # (plane dims minor) Mosaic rejects the (hb, w)→(hw, 1) shape
            # cast ("infer-vector-layout: unsupported shape cast").  The
            # cost is the 128-lane pad on every g block; at the 64² plane
            # that only fits the 16M scoped budget in bf16 (production) —
            # f32 remains OOM, recorded in BENCHMARKS.md.
            plane = (g0, g1, g2)[2 - td]
            window = plane[0, 0, pl.ds(r0 + (2 - th), hb),
                           2 - tw:2 - tw + w_out, 0].reshape(hw, 1)
            kcol = k_ref[0, :, t].reshape(1, ci)
            term = window.astype(jnp.float32) * kcol.astype(jnp.float32)
            dx = term if dx is None else dx + term
            dw_acc[:, t:t + 1] += jax.lax.dot_general(
                x2d, window, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dx_ref[0, 0, pl.ds(r0, hb)] = dx.reshape(hb, w_out, ci).astype(
            dx_ref.dtype)
        return carry

    jax.lax.fori_loop(0, h_out // hb, band, 0)

    @pl.when(jnp.logical_and(b == pl.num_programs(0) - 1,
                             d == pl.num_programs(1) - 1))
    def _():
        dw_ref[...] = dw_acc[...]


def _pallas_bwd(x: jax.Array, w: jax.Array, g: jax.Array):
    bsz, d, h, wd, ci = x.shape
    gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))).astype(x.dtype)
    k = _flatten_kernel(w, x.dtype).reshape(1, ci, 27)

    def gspec(kk):
        return pl.BlockSpec((1, 1, h + 2, wd + 2, 1),
                            lambda b, dd, kk=kk: (b, dd + kk, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    dx, dk = pl.pallas_call(
        _pallas_bwd_kernel,
        grid=(bsz, d),
        in_specs=[pl.BlockSpec((1, 1, h, wd, ci),
                               lambda b, dd: (b, dd, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  gspec(0), gspec(1), gspec(2),
                  pl.BlockSpec((1, ci, 27), lambda b, dd: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, 1, h, wd, ci),
                                lambda b, dd: (b, dd, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((ci, 27), lambda b, dd: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((bsz, d, h, wd, ci), x.dtype),
                   jax.ShapeDtypeStruct((ci, 27), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((ci, 27), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * d * h * wd * 27 * ci,
            bytes_accessed=(x.size + 3 * gp.size + x.size) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(x, gp, gp, gp, k)
    dw = dk.T.reshape(3, 3, 3, ci, 1).astype(w.dtype)
    return dx, dw


@jax.custom_vjp
def conv3d_co1_tapmajor(x: jax.Array, w: jax.Array) -> jax.Array:
    """SAME-padded stride-1 3³ conv with Co=1, tap-major MXU formulation.

    ``x`` NDHWC, ``w`` (3, 3, 3, Ci, 1).  Equals
    ``lax.conv_general_dilated(x, w, SAME)`` up to one bf16 rounding of the
    per-tap partial sums (exact in f32).
    """
    return _fwd(x, w)[0]


def _fwd(x, w):
    impl = head_conv_impl()
    if impl.startswith("tapP"):
        return _pallas_fwd(x, w), (x, w)
    k = _flatten_kernel(w, x.dtype)
    y = jnp.einsum("bdhwc,ct->bdhwt", x, k)
    combine = (_combine_taps_d if impl.startswith("tapD")
               else _combine_taps_a)
    out = combine(y)[..., None].astype(x.dtype)
    return out, (x, w)


def _shifted_cotangent_stack(g: jax.Array) -> jax.Array:
    """g (B,D,H,W) → g27 (B,D,H,W,27) with g27[..., t] = g at (q - off_t + 1)."""
    b, d, h, wd = g.shape
    gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (1, 1)))
    return jnp.stack(
        [gp[:, 2 - dz:2 - dz + d, 2 - dy:2 - dy + h, 2 - dx:2 - dx + wd]
         for (dz, dy, dx) in OFFSETS], axis=-1)


def _bwd(res, g):
    x, w = res
    if head_conv_impl().endswith("x"):
        # Mixed variant (``tapAx``/``tapDx``): tap-major forward, XLA's own
        # conv backward — for the case where the shifted-stack backward
        # measures slower than XLA's transposed-conv lowering.
        def ref_conv(x_, w_):
            return lax.conv_general_dilated(
                x_, w_.astype(x_.dtype), (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        _, vjp = jax.vjp(ref_conv, x, w)
        dx, dw = vjp(g.astype(x.dtype))
        return dx, dw.astype(w.dtype)
    if head_conv_impl().startswith("tapP"):
        return _pallas_bwd(x, w, g)
    k = _flatten_kernel(w, x.dtype)
    g27 = _shifted_cotangent_stack(g[..., 0].astype(x.dtype))
    dx = jnp.einsum("bdhwt,ct->bdhwc", g27, k).astype(x.dtype)
    if jax.default_backend() in ("tpu", "axon"):
        # bf16 contraction with f32 accumulation/output — the MXU-native mode
        dk = jnp.einsum("bdhwc,bdhwt->ct", x, g27,
                        preferred_element_type=jnp.float32)
    else:
        # CPU's dot thunk can't emit BF16 × BF16 = F32 — upcast instead
        dk = jnp.einsum("bdhwc,bdhwt->ct", x.astype(jnp.float32),
                        g27.astype(jnp.float32))
    ci = x.shape[-1]
    dw = dk.T.reshape(3, 3, 3, ci, 1).astype(w.dtype)
    return dx, dw


conv3d_co1_tapmajor.defvjp(_fwd, _bwd)
