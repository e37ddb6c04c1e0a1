"""Pallas VPU stencil for the Co=1 3^3 conv (the 64->1 deep-supervision /
mask head at 64x64x32): XLA pads the single output channel to the 128-lane
MXU tile, burning 128x the FLOPs (measured 13 ms in-program, ~1 TF).  A VPU
stencil does the 27 multiply-accumulates on (H,W,Ci) slabs and one final
lane reduction — FLOPs = the real 14.5 G, bounded by VPU rate (~2-4 TF).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/proto_co1_kernel.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
                x = x * (1.0 + 0.0001 * i) + jnp.mean(
                    out.astype(jnp.float32)).astype(x.dtype) * 1e-6
            return out

        return jax.jit(f)

    t0 = timeit(chain(K0), *args)
    t1 = timeit(chain(K1), *args)
    return (t1 - t0) / (K1 - K0)


def _co1_kernel(x0, x1, x2, w_ref, out_ref, acc):
    h, wd = out_ref.shape[2], out_ref.shape[3]
    ci = x0.shape[-1]
    acc[...] = jnp.zeros((h, wd, ci), jnp.float32)
    for td, xs in enumerate((x0, x1, x2)):
        plane = xs[0, 0]  # (H+2, W+2, Ci)
        for th in range(3):
            for tw in range(3):
                window = plane[th:th + h, tw:tw + wd, :]
                wrow = w_ref[td * 9 + th * 3 + tw].reshape(1, 1, ci)
                acc[...] += (window * wrow).astype(jnp.float32)
    out_ref[0, 0] = jnp.sum(acc[...], axis=-1).astype(out_ref.dtype)


def conv3d_co1_fwd(x, w):
    """x (B,D,H,W,Ci), w (3,3,3,Ci,1) -> (B,D,H,W) (channel squeezed)."""
    bsz, d, h, wd, ci = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    w27 = w[..., 0].astype(x.dtype).reshape(27, ci)

    def xspec(k):
        return pl.BlockSpec((1, 1, h + 2, wd + 2, ci),
                            lambda b, dd, k=k: (b, dd + k, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _co1_kernel,
        grid=(bsz, d),
        in_specs=[xspec(0), xspec(1), xspec(2),
                  pl.BlockSpec((27, ci), lambda b, dd: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, h, wd), lambda b, dd: (b, dd, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, d, h, wd), x.dtype),
        scratch_shapes=[pltpu.VMEM((h, wd, ci), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(xp, xp, xp, w27)


def mask_xla(x, w):
    return lax.conv_general_dilated(x, w, (1, 1, 1), [(1, 1)] * 3,
                                    dimension_numbers=("NDHWC", "DHWIO",
                                                       "NDHWC"))


def main():
    print("devices:", jax.devices())
    for (d, h, wd, ci) in [(64, 64, 32, 64), (32, 32, 16, 128)]:
        x = jax.random.normal(jax.random.key(0), (B, d, h, wd, ci), DT)
        w = jax.random.normal(jax.random.key(1), (3, 3, 3, ci, 1), DT) * 0.1
        ref = jax.jit(mask_xla)(x, w)[..., 0]
        try:
            out = jax.jit(conv3d_co1_fwd)(x, w)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            t_ref = per_iter(lambda x_, w_: mask_xla(x_, w_), x, w)
            t_k = per_iter(conv3d_co1_fwd, x, w)
            print(f"co1 {d}x{h}x{wd} ci={ci}: xla {t_ref*1e3:6.2f} ms | "
                  f"pallas {t_k*1e3:6.2f} ms ({t_ref/t_k:4.2f}x, err {err:.1e})")
        except Exception as e:
            print(f"co1 {d}x{h}x{wd} ci={ci}: FAIL {type(e).__name__}: "
                  f"{str(e)[:140]}")


if __name__ == "__main__":
    main()


# --- banded-matmul Pallas variant -----------------------------------------
# out(H,W) per (b,d) block = sum over 9 (td,th) of
#   plane_td[th:th+H].reshape(H, (W+2)*Ci) @ band_tdth((W+2)*Ci, W)
# band[(wi, c), wo] = w[td, th, wi-wo, c] for wi-wo in {0,1,2} (padded wi).
# K = (W+2)*Ci fully packed, N = W -> MXU instead of the 128x-padded XLA form.


def _band_mats(w, wd):
    """(9, (wd+2)*ci, wd) banded weights, built in-graph (differentiable)."""
    ci = w.shape[3]
    s = np.zeros((3, wd + 2, wd), np.float32)
    for tw in range(3):
        for wo in range(wd):
            s[tw, wo + tw, wo] = 1.0
    sj = jnp.asarray(s, w.dtype)
    bands = []
    for td in range(3):
        for th in range(3):
            wtap = w[td, th, :, :, 0]                     # (3, ci)
            bands.append(jnp.einsum("tiv,tc->icv", sj, wtap).reshape(
                (wd + 2) * ci, wd))
    return jnp.stack(bands)


def _co1_band_kernel(x0, x1, x2, b_ref, out_ref, acc):
    h, wd = out_ref.shape[2], out_ref.shape[3]
    ci = x0.shape[-1]
    acc[...] = jnp.zeros((h, wd), jnp.float32)
    for td, xs in enumerate((x0, x1, x2)):
        plane = xs[0, 0]  # (H+2, W+2, Ci)
        for th in range(3):
            window = plane[th:th + h].reshape(h, (wd + 2) * ci)
            acc[...] += jnp.dot(window, b_ref[td * 3 + th],
                                preferred_element_type=jnp.float32)
    out_ref[0, 0] = acc[...].astype(out_ref.dtype)


def conv3d_co1_band(x, w):
    bsz, d, h, wd, ci = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    bands = _band_mats(w.astype(x.dtype), wd)

    def xspec(k):
        return pl.BlockSpec((1, 1, h + 2, wd + 2, ci),
                            lambda b, dd, k=k: (b, dd + k, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _co1_band_kernel,
        grid=(bsz, d),
        in_specs=[xspec(0), xspec(1), xspec(2),
                  pl.BlockSpec((9, (wd + 2) * ci, wd),
                               lambda b, dd: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, h, wd), lambda b, dd: (b, dd, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, d, h, wd), x.dtype),
        scratch_shapes=[pltpu.VMEM((h, wd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(xp, xp, xp, bands)


def main2():
    print("devices:", jax.devices())
    for (d, h, wd, ci) in [(64, 64, 32, 64), (32, 32, 16, 128)]:
        x = jax.random.normal(jax.random.key(0), (B, d, h, wd, ci), DT)
        w = jax.random.normal(jax.random.key(1), (3, 3, 3, ci, 1), DT) * 0.1
        ref = jax.jit(mask_xla)(x, w)[..., 0]
        try:
            out = jax.jit(conv3d_co1_band)(x, w)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            t_ref = per_iter(lambda x_, w_: mask_xla(x_, w_), x, w)
            t_k = per_iter(conv3d_co1_band, x, w)
            print(f"co1-band {d}x{h}x{wd} ci={ci}: xla {t_ref*1e3:6.2f} ms | "
                  f"pallas {t_k*1e3:6.2f} ms ({t_ref/t_k:4.2f}x, "
                  f"err {err:.1e})")
        except Exception as e:
            print(f"co1-band {d}x{h}x{wd} ci={ci}: FAIL "
                  f"{type(e).__name__}: {str(e)[:140]}")
