"""Test two non-conv perf hypotheses on TPU:

1. maxpool 2^3/s2 backward: lax.reduce_window's grad is select_and_scatter —
   compare against a reshape+max formulation (non-overlapping windows).
2. BatchNorm(+ReLU) fwd/bwd cost: flax BN vs a hand-rolled
   stats/normalize with a custom VJP doing the minimal number of passes.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

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
    return (time.perf_counter() - t0) / n * 1000


def pool_rw(x):
    return lax.reduce_window(x, -jnp.inf, lax.max,
                             (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID")


def pool_reshape(x):
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    return x.max(axis=(2, 4, 6))


def main():
    print("devices:", jax.devices())
    x = jax.random.normal(jax.random.key(0), (B, 64, 64, 32, 64), DT)

    f1 = jax.jit(pool_rw)
    f2 = jax.jit(pool_reshape)
    np.testing.assert_allclose(np.asarray(f1(x), np.float32),
                               np.asarray(f2(x), np.float32))
    print(f"pool fwd: reduce_window {timeit(f1, x):6.2f} ms | "
          f"reshape {timeit(f2, x):6.2f} ms")

    g1 = jax.jit(jax.grad(lambda x: pool_rw(x).astype(jnp.float32).sum()))
    g2 = jax.jit(jax.grad(lambda x: pool_reshape(x).astype(jnp.float32).sum()))
    print(f"pool bwd: reduce_window {timeit(g1, x):6.2f} ms | "
          f"reshape {timeit(g2, x):6.2f} ms")

    # --- BN+ReLU ---
    import flax.linen as nn

    for c in (64, 128):
        shape = (B, 64, 64, 32, c) if c == 64 else (B, 32, 32, 16, c)
        x = jax.random.normal(jax.random.key(1), shape, DT)
        bn = nn.BatchNorm(use_running_average=False, momentum=0.9,
                          epsilon=1e-5, dtype=DT)
        v = bn.init(jax.random.key(2), x)

        def flax_fwd(v, x):
            y, _ = bn.apply(v, x, mutable=["batch_stats"])
            return jax.nn.relu(y)

        def manual_fwd(gamma, beta, x):
            xf = x.astype(jnp.float32)
            n = x.size // x.shape[-1]
            s1 = jnp.sum(xf, axis=(0, 1, 2, 3))
            s2 = jnp.sum(jnp.square(xf), axis=(0, 1, 2, 3))
            mu = s1 / n
            var = s2 / n - jnp.square(mu)
            inv = lax.rsqrt(var + 1e-5) * gamma
            y = (x.astype(jnp.float32) - mu) * inv + beta
            return jax.nn.relu(y).astype(DT)

        gamma = jnp.ones((c,), jnp.float32)
        beta = jnp.zeros((c,), jnp.float32)

        ff = jax.jit(flax_fwd)
        fm = jax.jit(manual_fwd)
        print(f"BN+relu fwd c={c}: flax {timeit(ff, v, x):6.2f} ms | "
              f"manual {timeit(fm, gamma, beta, x):6.2f} ms")

        gf = jax.jit(jax.grad(
            lambda v, x: flax_fwd(v, x).astype(jnp.float32).sum(), argnums=1))
        gm = jax.jit(jax.grad(
            lambda g, b, x: manual_fwd(g, b, x).astype(jnp.float32).sum(),
            argnums=2))
        print(f"BN+relu bwd c={c}: flax {timeit(gf, v, x):6.2f} ms | "
              f"manual {timeit(gm, gamma, beta, x):6.2f} ms")


if __name__ == "__main__":
    main()
