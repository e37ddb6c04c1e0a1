"""Decompose the heaviest backward convs (64x64x32 encoder shapes) into dx
and dw, and probe dx reformulations: XLA transposed conv vs the Pallas
packed/im2col kernels applied to the adjoint (dx of a SAME 3^3 conv is the
same conv with flipped, io-swapped weights).

dx of the 32->64 conv is suspected to be the single biggest op in the fused
step: XLA's form contracts K=Co=64 and emits N=Ci=32 — ~12-19% MXU packing.

In-program K-chained differencing as in proto_edge_convs.py.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/proto_bwd_convs.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

B = 32
DT = jnp.bfloat16
K0, K1 = 2, 8


def timeit(fn, *args, n=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0:1])
    return (time.perf_counter() - t0) / n


def per_iter(make_one, *args):
    def chain(k):
        def f(*a):
            x = a[0]
            out = None
            for i in range(k):
                out = make_one(x, *a[1:])
                # data-dependent feed-forward so DCE can't drop iterations
                x = x * (1.0 + 0.0001 * i) + jnp.mean(
                    out.astype(jnp.float32)).astype(x.dtype) * 1e-6
            return out

        return jax.jit(f)

    t0 = timeit(chain(K0), *args)
    t1 = timeit(chain(K1), *args)
    return (t1 - t0) / (K1 - K0)


def conv(x, w):
    return lax.conv_general_dilated(x, w, (1, 1, 1), [(1, 1)] * 3,
                                    dimension_numbers=("NDHWC", "DHWIO",
                                                       "NDHWC"))


def dx_xla(g, w):
    """XLA's own transpose: conv of g with flipped/io-swapped w."""
    wt = jnp.flip(w, (0, 1, 2)).swapaxes(3, 4)
    return conv(g, wt)


def dw_xla(x, g):
    """Filter grad via linear_transpose of the fwd conv."""
    def f(w_):
        return conv(x, w_)

    proto = jnp.zeros((3, 3, 3, x.shape[-1], g.shape[-1]), DT)
    return jax.linear_transpose(f, proto)(g)[0]


def run(d, h, wd, ci, co):
    kx, kw, kg = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(kx, (B, d, h, wd, ci), DT)
    w = jax.random.normal(kw, (3, 3, 3, ci, co), DT) * 0.1
    g = jax.random.normal(kg, (B, d, h, wd, co), DT)
    flops = 2 * 27 * ci * co * d * h * wd * B

    t_fwd = per_iter(conv, x, w)
    t_dx = per_iter(dx_xla, g, w)
    t_dw = per_iter(lambda x_, g_: dw_xla(x_, g_), x, g)
    print(f"conv {d}x{h}x{wd} {ci:3d}->{co:3d}: "
          f"fwd {t_fwd*1e3:6.2f} ({flops/t_fwd/1e12:5.1f} TF) | "
          f"dx {t_dx*1e3:6.2f} ({flops/t_dx/1e12:5.1f} TF) | "
          f"dw {t_dw*1e3:6.2f} ({flops/t_dw/1e12:5.1f} TF)")

    # dx via the Pallas kernels on the adjoint
    try:
        from pcrlv2_tpu.ops.pallas_conv import _im2col_fwd, _packed_fwd

        wt = jnp.flip(w, (0, 1, 2)).swapaxes(3, 4)
        bias = jnp.zeros((ci,), DT)
        err_p = float(jnp.max(jnp.abs(
            jax.jit(_packed_fwd)(g, wt, bias).astype(jnp.float32)
            - jax.jit(dx_xla)(g, w).astype(jnp.float32))))
        t_p = per_iter(lambda g_, w_: _packed_fwd(g_, w_, bias), g, wt)
        line = (f"   dx-packed {t_p*1e3:6.2f} ({flops/t_p/1e12:5.1f} TF, "
                f"err {err_p:.1e})")
        if (d, h, wd) != (64, 64, 32) or True:
            t_i = per_iter(lambda g_, w_: _im2col_fwd(g_, w_, bias), g, wt)
            err_i = float(jnp.max(jnp.abs(
                jax.jit(_im2col_fwd)(g, wt, bias).astype(jnp.float32)
                - jax.jit(dx_xla)(g, w).astype(jnp.float32))))
            line += (f" | dx-im2col {t_i*1e3:6.2f} "
                     f"({flops/t_i/1e12:5.1f} TF, err {err_i:.1e})")
        print(line)
    except Exception as e:
        print(f"   pallas dx FAIL {type(e).__name__}: {str(e)[:100]}")


def main():
    print("devices:", jax.devices())
    for shape in [
        (64, 64, 32, 32, 64),
        (64, 64, 32, 64, 64),
        (64, 64, 32, 128, 64),
        (32, 32, 16, 64, 128),
    ]:
        run(*shape)


if __name__ == "__main__":
    main()
