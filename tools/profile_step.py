"""Component timing for the fused 3D train step on the real TPU.

Breaks the headline bench (bench.py) into pieces to see where the step's time
goes: augmentation, each forward, the grad program, the SGD update.  Uses
device_get for sync (block_until_ready is a no-op on the tunneled backend —
BENCHMARKS.md).

Run: python tools/profile_step.py [--b 32]
"""

import argparse
import time

import numpy as np

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
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=32)
    args = ap.parse_args()
    B = args.b

    from pcrlv2_tpu.data.augment3d import make_luna_aug_fn
    from pcrlv2_tpu.data.pipeline import synthetic_luna_batch
    from pcrlv2_tpu.models import PCRLv23d
    from pcrlv2_tpu.train.optimizer import sgd
    from pcrlv2_tpu.train.step import (create_train_state, make_loss_fn,
                                       make_train_step)

    print("devices:", jax.devices())
    model = PCRLv23d()
    tx = sgd()
    sample = jnp.zeros((B, 64, 64, 32, 1), jnp.float32)
    state = create_train_state(model, tx, jax.random.key(0), sample)
    batch = jax.device_put(jax.tree.map(jnp.asarray, synthetic_luna_batch(B)))

    aug = jax.jit(make_luna_aug_fn())
    views = aug(jax.random.key(1), batch)
    views = jax.tree.map(lambda x: x.copy(), views)  # materialize

    print(f"aug                 {timeit(aug, jax.random.key(2), batch):8.1f} ms")

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=True,
                                           mutable=["batch_stats"]))
    print(f"global fwd (train)  {timeit(fwd, variables, views['x1']):8.1f} ms")

    fwd_local = jax.jit(lambda v, x: model.apply(v, x, local=True, train=True,
                                                 mutable=["batch_stats"]))
    locals_flat = jnp.swapaxes(views["locals"], 0, 1).reshape(
        (-1,) + views["locals"].shape[2:])
    print(f"local fwd (6 views) {timeit(fwd_local, variables, locals_flat):8.1f} ms")

    loss_fn = make_loss_fn(model, dim=3)
    val = jax.jit(lambda p, s, v, k, e: loss_fn(p, s, v, k, e)[0])
    print(f"loss fwd only       {timeit(val, state.params, state.batch_stats, views, jax.random.key(3), jnp.int32(0)):8.1f} ms")

    grad = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    print(f"loss fwd+grad       {timeit(grad, state.params, state.batch_stats, views, jax.random.key(3), jnp.int32(0)):8.1f} ms")

    step = jax.jit(make_train_step(model, tx, dim=3, aug_fn=None))
    def run_step(state, views):
        return step(state, views, jax.random.key(5), jnp.float32(1e-3),
                    jnp.int32(0))
    print(f"full step           {timeit(run_step, state, views):8.1f} ms")
    print(f"-> vols/s/chip at b={B}: "
          f"{B / (timeit(run_step, state, views) + timeit(aug, jax.random.key(2), batch)) * 1000:.1f}")


if __name__ == "__main__":
    main()
