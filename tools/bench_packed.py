"""Compare conv3d implementations (XLA vs im2col vs tw-packed Pallas) on
every 3^3 stride-1 shape in PCRLv23d: correctness vs XLA, then fwd and
fwd+dx+dw timing.

Run: python tools/bench_packed.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from pcrlv2_tpu.ops.pallas_conv import conv3d_im2col, conv3d_packed

B = 32
DT = jnp.bfloat16


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0:1])
    return (time.perf_counter() - t0) / n


def xla_conv(x, w, bias):
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out + bias.astype(out.dtype)


def bench(d, h, wd, ci, co):
    key = jax.random.key(0)
    kx, kw, kb = jax.random.split(key, 3)
    x = jax.random.normal(kx, (B, d, h, wd, ci), DT)
    w = jax.random.normal(kw, (3, 3, 3, ci, co), DT) * 0.1
    bias = jax.random.normal(kb, (co,), DT)
    flops = 2 * 27 * ci * co * d * h * wd * B

    ref = jax.jit(xla_conv)(x, w, bias)
    impls = {"xla": jax.jit(xla_conv)}
    try:
        out = jax.jit(conv3d_packed)(x, w, bias)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        impls["packed"] = jax.jit(conv3d_packed)
    except Exception as e:  # VMEM / lowering failure
        print(f"  packed FAILED {d}x{h}x{wd} {ci}->{co}: "
              f"{type(e).__name__}: {str(e)[:120]}")
        err = float("nan")
    try:
        jax.jit(conv3d_im2col)(x, w, bias)
        impls["im2col"] = jax.jit(conv3d_im2col)
    except Exception:
        pass

    row = f"conv {d:3d}x{h:3d}x{wd:3d} {ci:4d}->{co:4d} (err {err:.1e}): "
    times = {}
    for name, f in impls.items():
        tf_ = timeit(f, x, w, bias)
        g = jax.jit(lambda x, w, bias, f=f: jax.vjp(f, x, w, bias)[1](
            jnp.ones((B, d, h, wd, co), DT)))
        tg = timeit(g, x, w, bias)
        times[name] = (tf_, tg)
        row += (f"{name} fwd {tf_*1e3:6.2f} ms {flops/tf_/1e12:5.1f} TF "
                f"bwd {tg*1e3:6.2f} ms | ")
    if "packed" in times:
        row += (f"pk/xla fwd {times['xla'][0]/times['packed'][0]:.2f}x "
                f"bwd {times['xla'][1]/times['packed'][1]:.2f}x")
    print(row)


def main():
    print("devices:", jax.devices())
    for shape in [
        (64, 64, 32, 32, 32),
        (64, 64, 32, 32, 64),
        (32, 32, 16, 64, 64),
        (32, 32, 16, 64, 128),
        (16, 16, 8, 128, 128),
        (16, 16, 8, 128, 256),
        (8, 8, 4, 256, 256),
        (8, 8, 4, 256, 512),
        (16, 16, 8, 512, 256),
        (16, 16, 8, 256, 256),
        (32, 32, 16, 256, 128),
        (32, 32, 16, 128, 128),
        (64, 64, 32, 128, 64),
        (64, 64, 32, 64, 64),
    ]:
        bench(*shape)


if __name__ == "__main__":
    main()
