"""Prototype: im2col-packed Pallas conv3d with BlockSpec auto-pipelining.

XLA's 3D conv contracts only Ci per tap (31 TF at Ci=32, 51 at 64 — exactly
Ci/128 of the sustained rate).  This kernel packs all 27 taps into the
contraction: per (b, d) program, each tap window is reshaped to 2D
(H*W, Ci) (supported sublane merge) and lane-concatenated into
(H*W, 27*Ci) — Mosaic supports 2D lane concat at 32-lane granularity —
then ONE matmul against the (27*Ci, Co) weight matrix.

Variants: CONCAT9 (per-td concat, 3 matmuls) vs CONCAT27 (1 matmul).
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(mode: str):
    def kernel(x0, x1, x2, w_ref, b_ref, out_ref, acc):
        h_out = out_ref.shape[2]
        w_out = out_ref.shape[3]
        ci = x0.shape[-1]
        hw = h_out * w_out

        acc[...] = jnp.broadcast_to(
            b_ref[0].astype(jnp.float32), (hw, out_ref.shape[-1]))
        planes = (x0, x1, x2)
        if mode == "27":
            cols = jnp.concatenate(
                [planes[td][0, 0, th:th + h_out, tw:tw + w_out, :]
                 .reshape(hw, ci)
                 for td in range(3) for th in range(3) for tw in range(3)],
                axis=-1)
            acc[...] += jnp.dot(cols, w_ref[0],
                                preferred_element_type=jnp.float32)
        else:
            for td in range(3):
                cols = jnp.concatenate(
                    [planes[td][0, 0, th:th + h_out, tw:tw + w_out, :]
                     .reshape(hw, ci)
                     for th in range(3) for tw in range(3)], axis=-1)
                acc[...] += jnp.dot(
                    cols, w_ref[0, pl.ds(td * 9 * ci, 9 * ci)],
                    preferred_element_type=jnp.float32)
        out_ref[0, 0] = acc[...].reshape(
            h_out, w_out, out_ref.shape[-1]).astype(out_ref.dtype)

    return kernel


def conv3d_im2col(x, w, bias, mode="27"):
    """SAME 3x3x3 conv, x (B,D,H,W,Ci), w (3,3,3,Ci,Co)."""
    bsz, d, h, wd, ci = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    wmat = w.astype(x.dtype).reshape(1, 27 * ci, co)

    def xspec(k):
        return pl.BlockSpec((1, 1, h + 2, wd + 2, ci),
                            lambda b, dd, k=k: (b, dd + k, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _make_kernel(mode),
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


def ref_conv(x, w, bias):
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out + bias.astype(out.dtype)


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0:1])
    return (time.perf_counter() - t0) / n


def main():
    print("devices:", jax.devices())
    B = 32
    shapes = [(64, 64, 32, 32, 64),
              (32, 32, 16, 64, 64),
              (32, 32, 16, 64, 128),
              (64, 64, 32, 64, 64),
              (64, 64, 32, 128, 64),
              (64, 64, 32, 64, 1)]
    for (d, h, wd, ci, co) in shapes:
        x = jax.random.normal(jax.random.key(0), (B, d, h, wd, ci),
                              jnp.bfloat16)
        w = jax.random.normal(jax.random.key(1), (3, 3, 3, ci, co),
                              jnp.bfloat16) * 0.1
        b = jax.random.normal(jax.random.key(2), (co,), jnp.bfloat16)
        flops = 2 * B * d * h * wd * 27 * ci * co
        f_ref = jax.jit(ref_conv)
        want = np.asarray(f_ref(x, w, b), np.float32)
        t_ref = timeit(f_ref, x, w, b)
        line = (f"({d},{h},{wd}) {ci:3d}->{co:3d}: "
                f"xla {t_ref*1e3:7.2f} ms {flops/t_ref/1e12:6.1f} TF")
        for mode in ("27", "9"):
            try:
                f_new = jax.jit(functools.partial(conv3d_im2col, mode=mode))
                got = np.asarray(f_new(x, w, b), np.float32)
                err = (np.max(np.abs(got - want))
                       / max(np.max(np.abs(want)), 1e-6))
                t_new = timeit(f_new, x, w, b)
                line += (f" | im2col{mode} {t_new*1e3:7.2f} ms "
                         f"{flops/t_new/1e12:6.1f} TF "
                         f"({t_ref/t_new:4.2f}x, err {err:.1e})")
            except Exception as e:
                line += f" | im2col{mode} FAIL {str(e).splitlines()[0][:60]}"
        print(line)


if __name__ == "__main__":
    main()
