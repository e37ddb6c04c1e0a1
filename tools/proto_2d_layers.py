"""In-program per-layer probe of the 2D chest pipeline's suspicious ops:
the Ci=3 stem conv (7x7 s2), the Co=3 segmentation / deep-supervision
heads, the decoder's nearest-upsample + conv pairs, and the ResNet block
convs — to find whether any 2D layer is as lane-pathological as the 3D
Co=1 head was.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/proto_2d_layers.py
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

B = 64
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


def per_iter(make_one, *args, grad=False):
    def chain(k):
        def f(*a):
            x = a[0]
            out = None
            for i in range(k):
                out = make_one(x, *a[1:])
                x = x * (1.0 + 0.0001 * i) + jnp.mean(
                    out.astype(jnp.float32)).astype(x.dtype) * 1e-6
            return out

        if grad:
            return jax.jit(jax.grad(
                lambda *a: f(*a).astype(jnp.float32).sum(), argnums=(0, 1)))
        return jax.jit(f)

    t0 = timeit(chain(K0), *args)
    t1 = timeit(chain(K1), *args)
    return (t1 - t0) / (K1 - K0)


def conv2d(x, w, stride=1):
    pad = (w.shape[0] - 1) // 2
    return lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def probe(name, h, wd, ci, co, k=3, stride=1):
    x = jax.random.normal(jax.random.key(0), (B, h, wd, ci), DT)
    w = jax.random.normal(jax.random.key(1), (k, k, ci, co), DT) * 0.1
    flops = 2 * k * k * ci * co * (h // stride) * (wd // stride) * B
    tf_ = per_iter(lambda x_, w_: conv2d(x_, w_, stride), x, w)
    tg = per_iter(lambda x_, w_: conv2d(x_, w_, stride), x, w, grad=True)
    print(f"{name:28s} {h:3d}x{wd:3d} {ci:3d}->{co:3d} k{k}s{stride}: "
          f"fwd {tf_*1e3:6.2f} ms ({flops/tf_/1e12:5.1f} TF) | "
          f"fwd+bwd {tg*1e3:6.2f} ms")


def main():
    print("devices:", jax.devices())
    probe("stem", 224, 224, 3, 64, k=7, stride=2)
    probe("layer1 conv", 56, 56, 64, 64)
    probe("layer2 down", 56, 56, 64, 128, stride=2)
    probe("layer2 conv", 28, 28, 128, 128)
    probe("layer3 conv", 14, 14, 256, 256)
    probe("layer4 conv", 7, 7, 512, 512)
    probe("dec block3 conv (112^2)", 112, 112, 64, 32)
    probe("dec block4 conv (224^2)", 224, 224, 32, 16)
    probe("dec block4 conv2", 224, 224, 16, 16)
    probe("seg head", 224, 224, 16, 3)
    probe("ds head conv1x1 (224^2)", 224, 224, 16, 3, k=1)


if __name__ == "__main__":
    main()
