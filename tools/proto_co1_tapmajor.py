"""Tap-major reformulation of the Co=1 3^3 conv (deep-supervision mask head).

The trace accounting (BENCHMARKS.md) shows XLA lowers the 64->1 k3 conv at
64x64x32 as a VPU multiply_reduce_fusion: ~10.8 ms forward per global (3x its
memory floor) plus ~10 ms of backward fusions — the single largest
non-conv-skeleton cost left in the step.

Idea: contract channels FIRST on the MXU, then combine taps as a shifted-slice
sum that XLA can loop-fuse:

    y27[b,d,h,w,t] = sum_c x[b,d,h,w,c] * K[c,t]        (one (N,Ci)@(Ci,27) matmul)
    out[b,d,h,w]   = sum_t y27[b, d-dz_t+1, h-dy_t+1, w-dx_t+1, t]   (27 static slices)

Variants measured (in-program K-chained differencing, same protocol as
proto_bwd_convs.py):

  A: y27 kept as a trailing 27-lane dim (pads to 128 lanes in layout).
  D: y27 reshaped to (b,D,H,W*27) so lanes are 96% packed; combine reads
     strided lanes.
  xla: lax.conv baseline.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/proto_co1_tapmajor.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
                fb = jnp.mean(jax.tree.leaves(out)[0].astype(jnp.float32))
                x = x * (1.0 + 0.0001 * i) + fb.astype(x.dtype) * 1e-6
            return out

        return jax.jit(f)

    t0 = timeit(chain(K0), *args)
    t1 = timeit(chain(K1), *args)
    return (t1 - t0) / (K1 - K0)


def conv_xla(x, w):
    return lax.conv_general_dilated(x, w, (1, 1, 1), [(1, 1)] * 3,
                                    dimension_numbers=("NDHWC", "DHWIO",
                                                       "NDHWC"))


OFFSETS = [(dz, dy, dx) for dz in range(3) for dy in range(3)
           for dx in range(3)]


def conv_tapmajor_a(x, w):
    """Variant A: (..., 27) intermediate + 27 shifted static slices."""
    b, d, h, wd, ci = x.shape
    k = w.reshape(27, ci, -1)[:, :, 0].T  # (Ci, 27), tap-major columns
    y = jnp.einsum("bdhwc,ct->bdhwt", x, k.astype(x.dtype))
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    out = None
    for t, (dz, dy, dx) in enumerate(OFFSETS):
        # out[.,z,y,x] += y[., z+1-(dz-1)-1, ...] : source index z - dz + 2? —
        # conv: out[z] = sum_dz x[z + dz - 1] * w[dz]; y pad offset +1 so
        # slice start = dz.
        s = yp[:, dz:dz + d, dy:dy + h, dx:dx + wd, t]
        out = s if out is None else out + s
    return out[..., None]


def conv_tapmajor_d(x, w):
    """Variant D: lanes = W*27 (packed); combine via strided lane slices."""
    b, d, h, wd, ci = x.shape
    k = w.reshape(27, ci, -1)[:, :, 0].T
    y = jnp.einsum("bdhwc,ct->bdhwt", x, k.astype(x.dtype))
    y = y.reshape(b, d, h, wd * 27)
    ypad = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (27, 27)))
    out = None
    for t, (dz, dy, dx) in enumerate(OFFSETS):
        s = lax.slice(ypad, (0, dz, dy, dx * 27 + t),
                      (b, dz + d, dy + h, dx * 27 + t + (wd - 1) * 27 + 1),
                      (1, 1, 1, 27))
        out = s if out is None else out + s
    return out[..., None]


def head_loss(conv_fn):
    def f(x, w, g):
        out = conv_fn(x, w)
        return jnp.sum(out.astype(jnp.float32) * g)

    return f


def run(d, h, wd, ci, variants):
    import os

    from pcrlv2_tpu.ops.head_conv import conv3d_co1_tapmajor

    kx, kw, kg = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(kx, (B, d, h, wd, ci), DT)
    w = jax.random.normal(kw, (3, 3, 3, ci, 1), DT) * 0.1
    g = jax.random.normal(kg, (B, d, h, wd, 1), jnp.float32)
    flops = 2 * 27 * ci * d * h * wd * B

    ref = jax.jit(conv_xla)(x, w).astype(jnp.float32)
    for name in variants:
        # "opsA"/"opsD" = the production custom-VJP implementation
        # (ops/head_conv.py) under PCRL_HEADCONV=tapA/tapD; "xla" = baseline.
        if name == "xla":
            fn = conv_xla
        else:
            os.environ["PCRL_HEADCONV"] = "tap" + name[-1]
            fn = conv3d_co1_tapmajor
        try:
            out = jax.jit(fn)(x, w).astype(jnp.float32)
            err = float(jnp.max(jnp.abs(out - ref)))
            t_f = per_iter(fn, x, w)
            grad = jax.grad(head_loss(fn), argnums=(0, 1))
            t_g = per_iter(lambda x_, w_, g_: grad(x_, w_, g_), x, w, g)
            print(f"  {name:5s}: fwd {t_f*1e3:6.2f} ms "
                  f"({flops/t_f/1e12:5.1f} TF) | fwd+dx+dw {t_g*1e3:6.2f} ms "
                  f"| err {err:.2e}", flush=True)
        except Exception as e:
            print(f"  {name:5s}: FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


def main():
    import sys

    variants = sys.argv[1].split(",") if len(sys.argv) > 1 else \
        ["xla", "opsA", "opsD"]
    print("devices:", jax.devices(), flush=True)
    for shape in [(64, 64, 32, 64)]:
        print(f"Co=1 head at {shape[0]}x{shape[1]}x{shape[2]}, "
              f"Ci={shape[3]}:", flush=True)
        run(*shape, variants)


if __name__ == "__main__":
    main()
