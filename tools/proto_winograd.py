"""Winograd conv3d prototype (pure XLA): F(2,3)^3 and F(4,3)^3 vs lax.conv.

The fused step is pinned at the conv floor: XLA's direct conv is already at
its lane-packing-limited bound (measured: 24 TF at Ci=32, 52 at Ci=64 — i.e.
~Ci/128 of the sustained matmul rate), so the only way materially past it is
fewer FLOPs.  Winograd F(m,3) needs (m+2)^3/m^3 multiplies per output vs 27:
F(2,3)^3 = 3.375x fewer, F(4,3)^3 = 8x fewer.

This prototype materializes the transforms in HBM (XLA-only, no Pallas) to
measure correctness + what the transform traffic costs; a VMEM-fused Pallas
kernel removes that traffic if the matmul stage shows a win.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/proto_winograd.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

B = 32


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0:1])
    return (time.perf_counter() - t0) / n


# --- transform matrices ----------------------------------------------------

# F(2,3): y = A^T [ (G g) .* (B^T d) ],  d 4-vec, g 3-vec, y 2-vec
BT2 = np.array([
    [1, 0, -1, 0],
    [0, 1, 1, 0],
    [0, -1, 1, 0],
    [0, 1, 0, -1],
], np.float32)
G2 = np.array([
    [1, 0, 0],
    [0.5, 0.5, 0.5],
    [0.5, -0.5, 0.5],
    [0, 0, 1],
], np.float32)
AT2 = np.array([
    [1, 1, 1, 0],
    [0, 1, -1, -1],
], np.float32)

# F(4,3) (standard Lavin-Gray points 0, ±1, ±2):
BT4 = np.array([
    [4, 0, -5, 0, 1, 0],
    [0, -4, -4, 1, 1, 0],
    [0, 4, -4, -1, 1, 0],
    [0, -2, -1, 2, 1, 0],
    [0, 2, -1, -2, 1, 0],
    [0, 4, 0, -5, 0, 1],
], np.float32)
G4 = np.array([
    [1 / 4, 0, 0],
    [-1 / 6, -1 / 6, -1 / 6],
    [-1 / 6, 1 / 6, -1 / 6],
    [1 / 24, 1 / 12, 1 / 6],
    [1 / 24, -1 / 12, 1 / 6],
    [0, 0, 1],
], np.float32)
AT4 = np.array([
    [1, 1, 1, 1, 1, 0],
    [0, 1, -1, 2, -2, 0],
    [0, 1, 1, 4, 4, 0],
    [0, 1, -1, 8, -8, 1],
], np.float32)


def _tdot(mat, x, axis):
    """Apply `mat` (t_out, t_in) along `axis` of x."""
    x = jnp.moveaxis(x, axis, -1)
    y = jnp.einsum("...i,oi->...o", x, mat)
    return jnp.moveaxis(y, -1, axis)


def _tile_axis(x, axis, m, t, n):
    """(…, m·n+2, …) -> (…, n, t, …): overlapping length-t windows, stride m,
    via t strided slices along `axis` (padded input)."""
    parts = []
    for o in range(t):
        start = [0] * x.ndim
        stop = list(x.shape)
        strides = [1] * x.ndim
        start[axis] = o
        stop[axis] = o + m * (n - 1) + 1
        strides[axis] = m
        parts.append(lax.slice(x, start, stop, strides))
    y = jnp.stack(parts, axis=axis + 1)  # (…, n, t, …)
    return y


def winograd_conv3d(x, w, m, BT, G, AT, mm_dtype=jnp.bfloat16,
                    tf_dtype=jnp.bfloat16, chunk=8):
    """SAME 3^3 conv via Winograd F(m,3)^3.  x (B,D,H,W,Ci), w (3,3,3,Ci,Co).

    Transforms in tf_dtype on materialized HBM tensors (8x the activation —
    chunked over batch to bound HBM); tap matmuls in mm_dtype.
    """
    b, d, h, wd, ci = x.shape
    co = w.shape[-1]
    t = m + 2
    assert d % m == 0 and h % m == 0 and wd % m == 0
    nd, nh, nw = d // m, h // m, wd // m

    # weight transform: (3,3,3,Ci,Co) -> (t,t,t,Ci,Co) in f32
    wt = w.astype(jnp.float32)
    for ax in (0, 1, 2):
        wt = _tdot(jnp.asarray(G), wt, ax)
    wmat = wt.reshape(t * t * t, ci, co).astype(mm_dtype)
    BTj = jnp.asarray(BT, tf_dtype)
    ATj = jnp.asarray(AT, jnp.float32)

    def one_chunk(xc):
        bc = xc.shape[0]
        xp = jnp.pad(xc, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        tiles = _tile_axis(xp, 1, m, t, nd)        # (b, nd, t, H+2, W+2, ci)
        tiles = _tile_axis(tiles, 3, m, t, nh)     # (b, nd, t, nh, t, W+2, ci)
        tiles = _tile_axis(tiles, 5, m, t, nw)     # (b, nd,t, nh,t, nw,t, ci)
        tiles = tiles.transpose(0, 1, 3, 5, 2, 4, 6, 7).astype(tf_dtype)
        for ax in (4, 5, 6):
            tiles = _tdot(BTj, tiles, ax)
        v = tiles.reshape(bc * nd * nh * nw, t * t * t, ci)
        v = jnp.moveaxis(v, 1, 0).astype(mm_dtype)          # (t^3, T, ci)
        mres = jnp.einsum("kti,kio->kto", v, wmat,
                          preferred_element_type=jnp.float32)
        mres = jnp.moveaxis(mres, 0, 1).reshape(
            bc, nd, nh, nw, t, t, t, co)
        for ax in (4, 5, 6):
            mres = _tdot(ATj, mres, ax)         # (..., m,m,m, co)
        y = mres.reshape(bc, nd, nh, nw, m, m, m, co)
        y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(bc, d, h, wd, co)
        return y.astype(x.dtype)

    if chunk >= b:
        return one_chunk(x)
    xs = x.reshape(b // chunk, chunk, d, h, wd, ci)
    return lax.map(one_chunk, xs).reshape(b, d, h, wd, co)


def xla_conv(x, w):
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def bench(d, h, wd, ci, co):
    kx, kw = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (B, d, h, wd, ci), jnp.bfloat16)
    w = (jax.random.normal(kw, (3, 3, 3, ci, co), jnp.float32)
         * (1.0 / np.sqrt(27 * ci))).astype(jnp.bfloat16)
    flops = 2 * 27 * ci * co * d * h * wd * B

    ref = jax.jit(xla_conv)(x, w)
    t_ref = timeit(jax.jit(xla_conv), x, w)
    scale = float(jnp.mean(jnp.abs(ref.astype(jnp.float32)))) + 1e-9

    line = (f"conv {d:3d}x{h:3d}x{wd:3d} {ci:4d}->{co:4d}: "
            f"xla {t_ref*1e3:7.2f} ms {flops/t_ref/1e12:5.1f} TF")
    for name, (m, BT, G, AT) in (("F2", (2, BT2, G2, AT2)),
                                 ("F4", (4, BT4, G4, AT4))):
        f = jax.jit(functools.partial(
            winograd_conv3d, m=m, BT=BT, G=G, AT=AT))
        try:
            out = f(x, w)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32)))) / scale
            tw_ = timeit(f, x, w)
            line += (f" | {name} {tw_*1e3:7.2f} ms ({t_ref/tw_:4.2f}x, "
                     f"relerr {err:.1e})")
        except Exception as e:
            line += f" | {name} FAIL {type(e).__name__}: {str(e)[:60]}"
    print(line)


def main():
    print("devices:", jax.devices())
    for shape in [
        (64, 64, 32, 32, 64),
        (64, 64, 32, 64, 64),
        (64, 64, 32, 128, 64),
        (32, 32, 16, 64, 128),
        (32, 32, 16, 128, 128),
        (32, 32, 16, 256, 128),
        (16, 16, 8, 128, 256),
        (16, 16, 8, 256, 256),
        (16, 16, 8, 512, 256),
    ]:
        bench(*shape)


if __name__ == "__main__":
    main()
