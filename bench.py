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
# (run3d.sh / README.md:127, 2021-era V100-class hardware).  No CUDA device
# is reachable from this environment, so the denominator is BOUNDED rather
# than measured (full methodology: BENCHMARKS.md "Baseline"):
#
# * BASELINE_UPPER = 35 vols/s/GPU — the compute-bound ceiling: the step is
#   ~1.2 TFLOP/sample and V100 fp16 tensor peak is 125 TFLOPs; public 3D-conv
#   workloads sustain 25-35% of that peak, and 125·0.35/1.2 ≈ 36.  This
#   charitably assumes the input pipeline away.
# * BASELINE_LOWER = 3.75 vols/s/GPU — the input-bound reality: 4 torch
#   DataLoader workers each run the torchio affine/blur/swap stack at
#   ~0.5-1 s per 64³ sample on CPU, supporting ~5-15 vols/s *total* across
#   the 4 GPUs (measured anchor: this repo's bench_reference.py CPU-torch
#   run = 0.063 vols/s/device at b=2).
# * BASELINE_VOLUMES_PER_SEC_PER_CHIP = 30 — the primary denominator
#   (kept from round 1 for cross-round comparability): just under the
#   compute-bound ceiling, i.e. the most favorable defensible number for
#   the reference.
#
# bench_reference.py measures the true number when run on the reference's
# 4-GPU hardware; vs_baseline_{lower,upper} bracket the truth meanwhile.
BASELINE_VOLUMES_PER_SEC_PER_CHIP = 30.0
BASELINE_UPPER = 35.0   # reference compute-bound ceiling (per GPU)
BASELINE_LOWER = 3.75   # reference input-bound estimate (per GPU)

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
WARMUP = int(os.environ.get("BENCH_WARMUP", "3"))
STEPS = int(os.environ.get("BENCH_STEPS", "20"))
# ≥3 timed trials; the reported value is the MEDIAN (round-3 lesson: one
# contended trial put a fake −24% in the official record)
TRIALS = max(1, int(os.environ.get("BENCH_TRIALS", "3")))
# BENCH_PRNG=rbg A/Bs the hardware RNG key impl for the on-device aug
# (threefry is the deterministic default; rbg trades exact cross-run key
# semantics for cheaper random-bit generation on TPU)
PRNG_IMPL = os.environ.get("BENCH_PRNG") or None
DIM = int(os.environ.get("BENCH_DIM", "3"))  # 3 = LUNA (headline), 2 = chest
BASELINE_CHEST_IMGS_PER_SEC_PER_CHIP = 120.0  # V100-era estimate, 2D is ~4x lighter


def main():
    import functools

    # Refuse to time a contended chip: a background trainer serializing with
    # the bench made round 3's official number garbage. The trainer takes
    # the same lock (pcrlv2_tpu/utils/chiplock.py).
    from pcrlv2_tpu.utils import chiplock
    global _chip_lock
    _chip_lock = chiplock.guard_exclusive("bench.py")

    import jax
    import jax.numpy as jnp

    global key_fn
    key_fn = (functools.partial(jax.random.key, impl=PRNG_IMPL)
              if PRNG_IMPL else jax.random.key)

    from pcrlv2_tpu.data.augment2d import make_chest_aug_fn
    from pcrlv2_tpu.data.augment3d import make_luna_aug_fn
    from pcrlv2_tpu.data.pipeline import (synthetic_chest_batch,
                                          synthetic_luna_batch)
    from pcrlv2_tpu.models import PCRLv2, PCRLv23d
    from pcrlv2_tpu.train.optimizer import sgd
    from pcrlv2_tpu.train.step import create_train_state, make_train_step

    n_chips = jax.device_count()

    if DIM == 2:
        from pcrlv2_tpu.train.step import make_pipelined_train_step

        batch_n = BATCH * 2  # run2d.sh operating point is b=64
        model = PCRLv2()
        tx = sgd()
        sample = jnp.zeros((batch_n, 224, 224, 3), jnp.float32)
        state = create_train_state(model, tx, key_fn(0), sample)
        aug_fn = make_chest_aug_fn()
        aug = jax.jit(aug_fn)
        pipe = jax.jit(make_pipelined_train_step(model, tx, aug_fn, dim=2,
                                                 loss_guard=None),
                       donate_argnums=(0, 1))
        batch = jax.device_put(
            jax.tree.map(jnp.asarray, synthetic_chest_batch(batch_n)))
        metric, unit = "2d_pretrain_imgs_per_sec_per_chip", "imgs/sec/chip"
        baseline, bsz = BASELINE_CHEST_IMGS_PER_SEC_PER_CHIP, batch_n
        run_bench_pipelined(jax, aug, pipe, state, batch, bsz, n_chips,
                            metric, unit, baseline)
        return

    from pcrlv2_tpu.train.step import make_pipelined_train_step

    model = PCRLv23d(upsample_masks=os.environ.get("BENCH_LAZY_MASKS", "0") != "1",
                     remat=os.environ.get("BENCH_REMAT", "0") == "1")
    tx = sgd()
    sample = jnp.zeros((BATCH, 64, 64, 32, 1), jnp.float32)
    state = create_train_state(model, tx, key_fn(0), sample)

    # production path: the step + NEXT batch's aug in ONE program (one
    # dispatch per step; device-time-neutral in this saturated loop, hides
    # host gaps in real training loops — see make_pipelined_train_step)
    aug_fn = make_luna_aug_fn()
    aug = jax.jit(aug_fn)
    pipe = jax.jit(make_pipelined_train_step(model, tx, aug_fn, dim=3),
                   donate_argnums=(0, 1))

    batch = jax.device_put(
        jax.tree.map(jnp.asarray, synthetic_luna_batch(BATCH)))
    run_bench_pipelined(jax, aug, pipe, state, batch, BATCH, n_chips,
                        "3d_pretrain_volumes_per_sec_per_chip",
                        "volumes/sec/chip", BASELINE_VOLUMES_PER_SEC_PER_CHIP)


def run_bench_pipelined(jax, aug, pipe, state, batch, bsz, n_chips, metric,
                        unit, baseline):
    import jax.numpy as jnp

    lr = jnp.float32(1e-3)
    epoch = jnp.int32(0)

    def sync(x):
        return jax.device_get(jax.tree.leaves(x)[0].ravel()[0:1])

    views = aug(key_fn(999), batch)
    for i in range(WARMUP):
        state, metrics, views = pipe(state, views, batch, key_fn(i),
                                     key_fn(1000 + i), lr, epoch)
    sync(metrics)
    sync(state.params)

    trials = []
    for t in range(TRIALS):
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, metrics, views = pipe(state, views, batch,
                                         key_fn(100 + t * STEPS + i),
                                         key_fn(2000 + t * STEPS + i),
                                         lr, epoch)
        sync(metrics)
        sync(state.params)
        dt = time.perf_counter() - t0
        trials.append(bsz * STEPS / dt / n_chips)

    trials.sort()
    per_chip = trials[len(trials) // 2]  # median of >=3 trials
    out = {
        "metric": metric,
        "value": round(per_chip, 3),
        "unit": unit,
        "vs_baseline": round(per_chip / baseline, 3),
        "trials": [round(x, 3) for x in trials],
    }
    spread = (trials[-1] - trials[0]) / per_chip if per_chip else 0.0
    if spread > 0.10:
        # the chip lock should make this impossible; if it fires anyway the
        # run was perturbed (tunnel hiccup / host load) — rerun before trusting
        out["spread_warning"] = (f"trial spread {spread:.1%} > 10% — "
                                 "measurement perturbed, rerun")
    if baseline == BASELINE_VOLUMES_PER_SEC_PER_CHIP:
        # the denominator is a bounded estimate, not a measurement — report
        # the bracket too (see the BASELINE_* derivation above)
        out["vs_baseline_conservative"] = round(per_chip / BASELINE_UPPER, 3)
        out["vs_baseline_optimistic"] = round(per_chip / BASELINE_LOWER, 3)
        out["baseline_note"] = ("denominator is the documented compute-bound "
                                "estimate (BENCHMARKS.md 'Baseline'); "
                                "conservative/optimistic divide by the "
                                "35/3.75 vols/s/GPU bounds")
    print(json.dumps(out))


def run_bench(jax, aug, step, state, batch, bsz, n_chips, metric, unit,
              baseline):
    import jax.numpy as jnp

    lr = jnp.float32(1e-3)
    epoch = jnp.int32(0)

    def sync(x):
        # device_get forces execution; block_until_ready returns early on the
        # tunneled axon backend and reports async-dispatch throughput
        return jax.device_get(jax.tree.leaves(x)[0].ravel()[0:1])

    for i in range(WARMUP):
        views = aug(key_fn(1000 + i), batch)
        state, metrics = step(state, views, key_fn(i), lr, epoch)
    sync(metrics)
    sync(state.params)

    t0 = time.perf_counter()
    for i in range(STEPS):
        views = aug(key_fn(2000 + i), batch)
        state, metrics = step(state, views, key_fn(100 + i), lr, epoch)
    sync(metrics)
    sync(state.params)
    dt = time.perf_counter() - t0

    per_chip = bsz * STEPS / dt / n_chips
    print(json.dumps({
        "metric": metric,
        "value": round(per_chip, 3),
        "unit": unit,
        "vs_baseline": round(per_chip / baseline, 3),
    }))


if __name__ == "__main__":
    main()
