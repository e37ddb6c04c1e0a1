"""Decompose the 3D forward's time: conv-only skeleton vs +relu vs +BN —
single jitted programs, weights passed as arguments (closure capture would
inline them as MLIR constants, which the axon backend rejects).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_layers.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from pcrlv2_tpu.ops import conv3d, conv_transpose3d, max_pool3d

B = 32
DT = jnp.bfloat16

ENC = [(1, 32), (32, 64), None, (64, 64), (64, 128), None,
       (128, 128), (128, 256), None, (256, 256), (256, 512)]
DEC = [(512, 512, "t"), (512, 256), (256, 256),
       (256, 256, "t"), (256, 128), (128, 128),
       (128, 128, "t"), (128, 64), (64, 64)]


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0:1])
    return (time.perf_counter() - t0) / n * 1000


def make_weights(key):
    ws = []
    k = key
    for spec in ENC + DEC:
        if spec is None:
            continue
        k, sub = jax.random.split(k)
        kk = 2 if len(spec) == 3 else 3
        ws.append(jax.random.normal(sub, (kk, kk, kk, spec[0], spec[1]),
                                    DT) * 0.05)
    return ws


def chain(ws, x, with_bn, with_act):
    j = 0
    out = x
    for spec in ENC + DEC:
        if spec is None:
            out = max_pool3d(out)
            continue
        w = ws[j]
        j += 1
        if len(spec) == 3:
            out = conv_transpose3d(out, w, None, stride=2)
        else:
            out = conv3d(out, w, None)
        if with_bn:
            xf = out.astype(jnp.float32)
            mu = jnp.mean(xf, axis=(0, 1, 2, 3))
            var = jnp.mean(jnp.square(xf), axis=(0, 1, 2, 3)) - jnp.square(mu)
            out = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(DT)
        if with_act:
            out = jax.nn.relu(out)
    return out


def main():
    print("devices:", jax.devices())
    ws = make_weights(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (B, 64, 64, 32, 1), DT)

    f_conv = jax.jit(lambda ws, x: chain(ws, x, False, False))
    f_act = jax.jit(lambda ws, x: chain(ws, x, False, True))
    f_bn = jax.jit(lambda ws, x: chain(ws, x, True, True))
    print(f"conv/pool skeleton      {timeit(f_conv, ws, x):7.1f} ms")
    print(f"+ relu                  {timeit(f_act, ws, x):7.1f} ms")
    print(f"+ batch-stats normalize {timeit(f_bn, ws, x):7.1f} ms")

    from pcrlv2_tpu.models import PCRLv23d
    model = PCRLv23d()
    v = jax.jit(lambda xx: model.init(jax.random.key(2), xx, train=True))(x[:1])
    full = jax.jit(lambda v, x: model.apply(v, x, train=True,
                                            mutable=["batch_stats"]))
    print(f"full model (train)      {timeit(full, v, x):7.1f} ms")
    eval_fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
    print(f"full model (eval BN)    {timeit(eval_fn, v, x):7.1f} ms")

    gskel = jax.jit(jax.grad(
        lambda ws, x: chain(ws, x, False, False).astype(jnp.float32).mean(),
        argnums=0))
    gbn = jax.jit(jax.grad(
        lambda ws, x: chain(ws, x, True, True).astype(jnp.float32).mean(),
        argnums=0))
    print(f"grad skeleton           {timeit(gskel, ws, x):7.1f} ms")
    print(f"grad + bn/relu          {timeit(gbn, ws, x):7.1f} ms")


if __name__ == "__main__":
    main()
