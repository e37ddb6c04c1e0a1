"""BN cost probe (in-program unroll): flax nn.BatchNorm vs hand-rolled
custom-VJP BN, fwd and fwd+bwd, at the model's hot activation shapes (b=32,
bf16 activations) — dispatch overhead excluded by chaining K applications
inside ONE jitted program and differencing K=2 vs K=12.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/proto_bn2.py
"""

import time

import jax
import jax.numpy as jnp
import flax.linen as nn

B = 32
EPS = 1e-5


def timeit(fn, *args, n=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0:1])
    return (time.perf_counter() - t0) / n


@jax.custom_vjp
def bn_train(x, gamma, beta):
    red = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, red)
    var = jnp.mean(jnp.square(xf), red) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + EPS)
    scale = (inv * gamma).astype(x.dtype)
    shift = (beta - mean * inv * gamma).astype(x.dtype)
    return x * scale + shift


def _bn_fwd(x, gamma, beta):
    red = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, red)
    var = jnp.mean(jnp.square(xf), red) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + EPS)
    scale = (inv * gamma).astype(x.dtype)
    shift = (beta - mean * inv * gamma).astype(x.dtype)
    return x * scale + shift, (x, mean, inv, gamma)


def _bn_bwd(res, dy):
    x, mean, inv, gamma = res
    red = tuple(range(x.ndim - 1))
    n = x.size // x.shape[-1]
    s = inv.astype(x.dtype)
    m = mean.astype(x.dtype)
    xhat = (x - m) * s  # bf16 rebuild
    dyf = dy.astype(jnp.float32)
    dbeta = jnp.sum(dyf, red)
    dgamma = jnp.sum(dyf * xhat.astype(jnp.float32), red)
    coef = gamma * inv
    dx = (dyf - dbeta / n - xhat.astype(jnp.float32) * (dgamma / n)) * coef
    return dx.astype(x.dtype), dgamma, dbeta


bn_train.defvjp(_bn_fwd, _bn_bwd)


def chain(apply_one, k):
    """x -> k chained BN applications (relu in between kills CSE)."""

    def f(x, gamma, beta):
        y = x
        for i in range(k):
            y = apply_one(y, gamma, beta)
            y = jnp.maximum(y, 0) + 0.001 * i  # break CSE, keep dtype
        return y

    return f


def bench(shape):
    c = shape[-1]
    x = jax.random.normal(jax.random.key(0), (B,) + shape, jnp.bfloat16)
    gamma = jnp.ones((c,), jnp.float32)
    beta = jnp.zeros((c,), jnp.float32)
    gb = x.size * 2 / 1e9
    K0, K1 = 2, 12
    span = K1 - K0

    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=EPS,
                      dtype=jnp.bfloat16)
    v = bn.init(jax.random.key(1), x)

    def flax_one(y, gamma, beta):
        return bn.apply(v, y, mutable=["batch_stats"])[0]

    line = f"BN {str(shape):>18} ({gb*1e3:6.0f} MB): "
    for name, one in (("flax", flax_one), ("custom", bn_train)):
        ts = {}
        for k in (K0, K1):
            f = jax.jit(chain(one, k))
            tf_ = timeit(f, x, gamma, beta)

            def loss(x, gamma, beta, f=chain(one, k)):
                return f(x, gamma, beta).astype(jnp.float32).sum()

            tg = timeit(jax.jit(jax.grad(loss, argnums=(0, 1, 2))),
                        x, gamma, beta)
            ts[k] = (tf_, tg)
        dfwd = (ts[K1][0] - ts[K0][0]) / span
        dtot = (ts[K1][1] - ts[K0][1]) / span
        dbwd = dtot - dfwd
        line += (f"{name} fwd {dfwd*1e3:6.2f} ({3*gb/dfwd:4.0f} GB/s) "
                 f"bwd {dbwd*1e3:6.2f} ({5*gb/max(dbwd,1e-9):4.0f} GB/s) | ")
    print(line)


def main():
    print("devices:", jax.devices())
    for shape in [
        (64, 64, 32, 32),
        (64, 64, 32, 64),
        (32, 32, 16, 128),
        (16, 16, 8, 256),
    ]:
        bench(shape)


if __name__ == "__main__":
    main()
