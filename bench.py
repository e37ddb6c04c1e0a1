"""Benchmark: 3D pretrain throughput (LUNA 64³ crop-pairs) on one chip.

Measures the FULL fused train step at the reference operating point
(``run3d.sh``: b=32, 64×64×32 crop pairs + 6×16³ locals): on-device
augmentation, 2 global forwards + concatenated local forward, 4-term loss,
backward, SGD — one compiled XLA program per step (reference hot loop:
``train_3d.py:109-151``).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference repo publishes no throughput numbers
(BASELINE.json ``published: {}``), and no CUDA GPU is reachable from this
environment to measure the 4-GPU ``nn.DataParallel`` baseline directly.
``vs_baseline`` therefore uses a documented per-chip estimate,
``BASELINE_VOLUMES_PER_SEC_PER_CHIP`` below; ``bench_reference.py`` is the
harness that measures the true number when run on the reference's hardware.
"""

import json
import os
import time

import numpy as np

# The reference trains with apex-AMP PCRLv23d at b=32 on 4 data-parallel GPUs
# (run3d.sh / README.md:127, 2021-era V100-class hardware).  Estimated
# steady-state throughput ~30 crop-pairs/sec per GPU (see BENCHMARKS.md for
# the derivation); replace with a bench_reference.py measurement when GPU
# hardware is available.
BASELINE_VOLUMES_PER_SEC_PER_CHIP = 30.0

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
WARMUP = int(os.environ.get("BENCH_WARMUP", "3"))
STEPS = int(os.environ.get("BENCH_STEPS", "20"))


def main():
    import jax
    import jax.numpy as jnp

    from pcrlv2_tpu.data.augment3d import make_luna_aug_fn
    from pcrlv2_tpu.data.pipeline import synthetic_luna_batch
    from pcrlv2_tpu.models import PCRLv23d
    from pcrlv2_tpu.train.optimizer import sgd
    from pcrlv2_tpu.train.step import create_train_state, make_train_step

    n_chips = jax.device_count()

    model = PCRLv23d()
    tx = sgd()
    sample = jnp.zeros((BATCH, 64, 64, 32, 1), jnp.float32)
    state = create_train_state(model, tx, jax.random.key(0), sample)

    # aug as its own jitted program: fusing it into the grad program makes
    # XLA schedule it ~40x slower (1613 vs 690 ms/step measured on v5e)
    aug = jax.jit(make_luna_aug_fn())
    step = jax.jit(
        make_train_step(model, tx, dim=3, aug_fn=None),
        donate_argnums=(0,),
    )

    batch = jax.device_put(
        jax.tree.map(jnp.asarray, synthetic_luna_batch(BATCH)))
    lr = jnp.float32(1e-3)
    epoch = jnp.int32(0)

    def sync(x):
        # device_get forces execution; block_until_ready returns early on the
        # tunneled axon backend and reports async-dispatch throughput
        return jax.device_get(jax.tree.leaves(x)[0].ravel()[0:1])

    for i in range(WARMUP):
        views = aug(jax.random.key(1000 + i), batch)
        state, metrics = step(state, views, jax.random.key(i), lr, epoch)
    sync(metrics)
    sync(state.params)

    t0 = time.perf_counter()
    for i in range(STEPS):
        views = aug(jax.random.key(2000 + i), batch)
        state, metrics = step(state, views, jax.random.key(100 + i), lr, epoch)
    sync(metrics)
    sync(state.params)
    dt = time.perf_counter() - t0

    vols_per_sec = BATCH * STEPS / dt
    per_chip = vols_per_sec / n_chips
    print(json.dumps({
        "metric": "3d_pretrain_volumes_per_sec_per_chip",
        "value": round(per_chip, 3),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_VOLUMES_PER_SEC_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
