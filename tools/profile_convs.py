"""Per-op timing of every conv shape in PCRLv23d (fwd / dx / dw) plus the
norm/pool/resize glue, with achieved TFLOP/s — to find which ops sit furthest
from the chip's sustained matmul rate (~124 TF bf16 on this v5e).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_convs.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from pcrlv2_tpu.ops import conv3d, conv_transpose3d, max_pool3d, upsample_linear

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


def bench_conv(d, h, w, ci, co):
    x = jnp.ones((B, d, h, w, ci), DT)
    wt = jnp.ones((3, 3, 3, ci, co), DT)
    flops = 2 * 27 * ci * co * d * h * w * B

    f = jax.jit(lambda x, wt: conv3d(x, wt))
    tf_ = timeit(f, x, wt)

    g = jax.jit(lambda x, wt: jax.vjp(lambda x, wt: conv3d(x, wt), x, wt)[1](
        jnp.ones((B, d, h, w, co), DT)))
    tg = timeit(g, x, wt)

    print(f"conv {d:3d}x{h:3d}x{w:3d} {ci:4d}->{co:4d}: "
          f"fwd {tf_*1e3:7.2f} ms {flops/tf_/1e12:6.1f} TF | "
          f"dx+dw {tg*1e3:7.2f} ms {2*flops/tg/1e12:6.1f} TF")


def bench_convt(d, h, w, ci, co):
    x = jnp.ones((B, d, h, w, ci), DT)
    wt = jnp.ones((2, 2, 2, ci, co), DT)
    flops = 2 * 8 * ci * co * d * h * w * B
    f = jax.jit(lambda x, wt: conv_transpose3d(x, wt))
    tf_ = timeit(f, x, wt)
    g = jax.jit(lambda x, wt: jax.vjp(lambda x, wt: conv_transpose3d(x, wt),
                                      x, wt)[1](
        jnp.ones((B, 2 * d, 2 * h, 2 * w, co), DT)))
    tg = timeit(g, x, wt)
    print(f"convT {d:3d}x{h:3d}x{w:3d} {ci:4d}->{co:4d}: "
          f"fwd {tf_*1e3:7.2f} ms {flops/tf_/1e12:6.1f} TF | "
          f"dx+dw {tg*1e3:7.2f} ms {2*flops/tg/1e12:6.1f} TF")


def bench_misc():
    import flax.linen as nn

    # BN fwd+bwd at the two largest shapes
    for (d, h, w, c) in [(64, 64, 32, 32), (64, 64, 32, 64), (32, 32, 16, 128)]:
        x = jnp.ones((B, d, h, w, c), DT)
        bn = nn.BatchNorm(use_running_average=False, momentum=0.9,
                          epsilon=1e-5, dtype=DT)
        v = bn.init(jax.random.key(0), x)
        f = jax.jit(lambda p, x: bn.apply(p, x, mutable=["batch_stats"])[0])
        t1 = timeit(f, v, x)
        g = jax.jit(jax.grad(lambda p, x: bn.apply(
            p, x, mutable=["batch_stats"])[0].astype(jnp.float32).sum()))
        t2 = timeit(g, v, x)
        gb = x.size * 2 / 1e9
        print(f"BN   {d}x{h}x{w}x{c}: fwd {t1*1e3:6.2f} ms "
              f"({gb/t1:5.0f} GB/s rd) | grad {t2*1e3:6.2f} ms")

    x = jnp.ones((B, 64, 64, 32, 32), DT)
    t = timeit(jax.jit(max_pool3d), x)
    print(f"maxpool 64x64x32x32: {t*1e3:6.2f} ms ({x.size*2/t/1e9:5.0f} GB/s)")

    x = jnp.ones((B, 16, 16, 8, 1), DT)
    t = timeit(jax.jit(lambda x: upsample_linear(x, 4)), x)
    print(f"upsample x4 16x16x8x1: {t*1e3:6.2f} ms")


def main():
    print("devices:", jax.devices())
    print(f"batch {B}, dtype {DT.__name__}")
    # encoder
    bench_conv(64, 64, 32, 1, 32)
    bench_conv(64, 64, 32, 32, 64)
    bench_conv(32, 32, 16, 64, 64)
    bench_conv(32, 32, 16, 64, 128)
    bench_conv(16, 16, 8, 128, 128)
    bench_conv(16, 16, 8, 128, 256)
    bench_conv(8, 8, 4, 256, 256)
    bench_conv(8, 8, 4, 256, 512)
    # decoder
    bench_convt(8, 8, 4, 512, 512)
    bench_conv(16, 16, 8, 512, 256)
    bench_conv(16, 16, 8, 256, 256)
    bench_convt(16, 16, 8, 256, 256)
    bench_conv(32, 32, 16, 256, 128)
    bench_conv(32, 32, 16, 128, 128)
    bench_convt(32, 32, 16, 128, 128)
    bench_conv(64, 64, 32, 128, 64)
    bench_conv(64, 64, 32, 64, 64)
    bench_conv(64, 64, 32, 64, 1)   # mask head
    bench_misc()


if __name__ == "__main__":
    main()
