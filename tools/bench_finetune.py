"""Device-resident throughput of the ``--phase finetune`` steps (round 5).

Same methodology as ``bench.py`` (chip-lock guarded, ≥3 timed trials,
median reported, device_get sync — ``block_until_ready`` returns early on
the tunneled axon backend): measures the jitted downstream steps the
finetune trainer dispatches per batch.

* 3D: full ``PCRLv23d`` → Dice+BCE segmentation step at the reference
  operating point (b=32, 64×64×32 volumes; ``train/finetune.py
  make_finetune_step_3d``).
* 2D: ``ChestClassifier`` (ResNet-18 + head) → 14-label BCE step at the
  ``run2d.sh`` point (b=64, 224²; ``make_finetune_step_2d``).

Prints one JSON line per dimension.  BENCH_DIMS=3 / 2 / 23 selects.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARMUP = int(os.environ.get("BENCH_WARMUP", "3"))
STEPS = int(os.environ.get("BENCH_STEPS", "20"))
TRIALS = max(1, int(os.environ.get("BENCH_TRIALS", "3")))
DIMS = os.environ.get("BENCH_DIMS", "23")


def bench_loop(jax, step_fn, state, args_fn, bsz):
    import jax.numpy as jnp  # noqa: F401

    def sync(x):
        return jax.device_get(jax.tree.leaves(x)[0].ravel()[0:1])

    metrics = None
    for i in range(WARMUP):
        state, metrics = step_fn(state, *args_fn(i))
    if metrics is not None:  # BENCH_WARMUP=0: first trial pays the compile
        sync(metrics)
    sync(state.params)
    trials = []
    for t in range(TRIALS):
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, metrics = step_fn(state, *args_fn(100 + t * STEPS + i))
        sync(metrics)
        sync(state.params)
        trials.append(bsz * STEPS / (time.perf_counter() - t0))
    trials.sort()
    return trials


def main():
    from pcrlv2_tpu.utils import chiplock

    lock = chiplock.guard_exclusive("bench_finetune")

    import jax
    import jax.numpy as jnp

    from pcrlv2_tpu.train.finetune import (ChestClassifier,
                                           create_finetune_state,
                                           make_finetune_step_2d,
                                           make_finetune_step_3d, pseudo_mask)
    from pcrlv2_tpu.train.optimizer import sgd
    from pcrlv2_tpu.train.step import create_train_state

    n_chips = jax.device_count()
    tx = sgd()
    lr = jnp.float32(1e-3)
    rng = np.random.RandomState(0)

    if "3" in DIMS:
        from pcrlv2_tpu.models import PCRLv23d

        b = int(os.environ.get("BENCH_BATCH3", "32"))
        model = PCRLv23d()
        state = create_train_state(model, tx, jax.random.key(0),
                                   jnp.zeros((b, 64, 64, 32, 1), jnp.float32))
        vols = jax.device_put(
            jnp.asarray(rng.rand(b, 64, 64, 32, 1), jnp.float32))
        masks = pseudo_mask(vols)
        step = jax.jit(make_finetune_step_3d(model, tx), donate_argnums=(0,))
        trials = bench_loop(jax, step, state,
                            lambda i: (vols, masks, lr), b)
        per_chip = trials[len(trials) // 2] / n_chips
        print(json.dumps({
            "metric": "3d_finetune_volumes_per_sec_per_chip",
            "value": round(per_chip, 3), "unit": "volumes/sec/chip",
            "batch": b, "trials": [round(x, 3) for x in trials]}))

    if "2" in DIMS:
        b = int(os.environ.get("BENCH_BATCH2", "64"))
        clf = ChestClassifier(n_class=14)
        state = create_finetune_state(
            clf, tx, jax.random.key(1),
            jnp.zeros((b, 224, 224, 3), jnp.float32))
        imgs = jax.device_put(
            jnp.asarray(rng.rand(b, 224, 224, 3), jnp.float32))
        labels = jax.device_put(jnp.asarray(
            (rng.rand(b, 14) > 0.5).astype(np.float32)))
        step = jax.jit(make_finetune_step_2d(clf, tx), donate_argnums=(0,))
        trials = bench_loop(
            jax, step, state,
            lambda i: (imgs, labels, jax.random.key(i), lr), b)
        per_chip = trials[len(trials) // 2] / n_chips
        print(json.dumps({
            "metric": "2d_finetune_imgs_per_sec_per_chip",
            "value": round(per_chip, 3), "unit": "imgs/sec/chip",
            "batch": b, "trials": [round(x, 3) for x in trials]}))

    lock.release()


if __name__ == "__main__":
    main()
