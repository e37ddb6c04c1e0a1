"""Component timing for the 2D chest pipeline on the real TPU.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_step2d.py
"""

import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0:1])
    return (time.perf_counter() - t0) / n * 1000


def main():
    from pcrlv2_tpu.data.augment2d import make_chest_aug_fn
    from pcrlv2_tpu.data.pipeline import synthetic_chest_batch
    from pcrlv2_tpu.models import PCRLv2
    from pcrlv2_tpu.train.optimizer import sgd
    from pcrlv2_tpu.train.step import (create_train_state, make_loss_fn,
                                       make_train_step)

    B = 64
    print("devices:", jax.devices())
    model = PCRLv2()
    tx = sgd()
    sample = jnp.zeros((B, 224, 224, 3), jnp.float32)
    state = create_train_state(model, tx, jax.random.key(0), sample)
    batch = jax.device_put(jax.tree.map(jnp.asarray, synthetic_chest_batch(B)))

    aug = jax.jit(make_chest_aug_fn())
    views = jax.tree.map(lambda x: x.copy(), aug(jax.random.key(1), batch))
    print(f"aug                 {timeit(aug, jax.random.key(2), batch):8.1f} ms")

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=True,
                                           mutable=["batch_stats"]))
    print(f"global fwd (224^2)  {timeit(fwd, variables, views['x1']):8.1f} ms")

    fwd_local = jax.jit(lambda v, x: model.apply(v, x, local=True, train=True,
                                                 mutable=["batch_stats"]))
    locals_flat = jnp.swapaxes(views["locals"], 0, 1).reshape(
        (-1,) + views["locals"].shape[2:])
    print(f"local fwd (6x96^2)  {timeit(fwd_local, variables, locals_flat):8.1f} ms")

    # encoder alone vs full
    from pcrlv2_tpu.models.resnet import ResNet18Encoder
    enc = ResNet18Encoder()
    ev = jax.jit(lambda x: enc.init(jax.random.key(3), x, train=True))(
        sample[:1])
    efwd = jax.jit(lambda v, x: enc.apply(v, x, train=True,
                                          mutable=["batch_stats"]))
    print(f"encoder fwd         {timeit(efwd, ev, views['x1']):8.1f} ms")

    loss_fn = make_loss_fn(model, dim=2)
    grad = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    print(f"loss fwd+grad       {timeit(grad, state.params, state.batch_stats, views, jax.random.key(3), jnp.int32(0)):8.1f} ms")

    # NB no donation: timeit re-calls with the same state, a donated buffer
    # would be dead on the second call
    step = jax.jit(make_train_step(model, tx, dim=2, aug_fn=None,
                                   loss_guard=None))
    def run(state, views):
        return step(state, views, jax.random.key(5), jnp.float32(1e-2),
                    jnp.int32(0))
    t = timeit(run, state, views)
    print(f"full step           {t:8.1f} ms -> {B/ (t/1000):.0f} imgs/s w/o aug")


if __name__ == "__main__":
    main()
