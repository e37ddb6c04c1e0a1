"""Round-4 measurement matrix in ONE process (tunnel warm-up amortized).

Runs the remaining unmeasured cells of the fused-step perf matrix
sequentially on the single chip, each as bench.py measures it (pipelined
step, device-resident batch, median of >=3 device_get-synced trials):

  - PCRL_HEADCONV=tapP / tapPx at the production b=32 (round 3's compile
    FAIL is fixed by fori_loop row-banding; these cells were the last gap
    in the head-conv ledger)
  - BENCH_REMAT analog at b=48 / b=64 (does rematerialization recover the
    HBM-spill loss that made b>32 slower in round 2?), with same-session
    non-remat comparators
  - default b=32 comparator

Usage: python tools/bench_matrix_r4.py [config ...]
  config = name:batch[:remat][:headconv]   e.g. tapP:32:0:tapP remat48:48:1
  (no args = the full round-4 list)

Results append to /tmp/bench_matrix_r4.jsonl and print as one JSON line per
config.  Reference hot loop being measured: train_3d.py:109-151.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcrlv2_tpu.utils import chiplock

_lock = chiplock.guard_exclusive("bench_matrix_r4")

import jax
import jax.numpy as jnp

WARMUP = int(os.environ.get("BENCH_WARMUP", "3"))
STEPS = int(os.environ.get("BENCH_STEPS", "20"))
TRIALS = max(1, int(os.environ.get("BENCH_TRIALS", "3")))

DEFAULT_CONFIGS = [
    # name, batch, remat, headconv
    ("default32", 32, False, "xla"),
    ("tapP", 32, False, "tapP"),
    ("tapPx", 32, False, "tapPx"),
    ("plain48", 48, False, "xla"),
    ("remat48", 48, True, "xla"),
    ("plain64", 64, False, "xla"),
    ("remat64", 64, True, "xla"),
]


def parse(arg):
    parts = arg.split(":")
    name = parts[0]
    batch = int(parts[1]) if len(parts) > 1 else 32
    remat = bool(int(parts[2])) if len(parts) > 2 else False
    headconv = parts[3] if len(parts) > 3 else "xla"
    return name, batch, remat, headconv


def sync(x):
    return jax.device_get(jax.tree.leaves(x)[0].ravel()[0:1])


def measure(name, batch, remat, headconv):
    from pcrlv2_tpu.data.augment3d import make_luna_aug_fn
    from pcrlv2_tpu.data.pipeline import synthetic_luna_batch
    from pcrlv2_tpu.models import PCRLv23d
    from pcrlv2_tpu.train.optimizer import sgd
    from pcrlv2_tpu.train.step import create_train_state, make_pipelined_train_step

    os.environ["PCRL_HEADCONV"] = headconv  # read at trace time

    model = PCRLv23d(remat=remat)
    tx = sgd()
    sample = jnp.zeros((batch, 64, 64, 32, 1), jnp.float32)
    state = create_train_state(model, tx, jax.random.key(0), sample)
    aug_fn = make_luna_aug_fn()
    aug = jax.jit(aug_fn)
    pipe = jax.jit(make_pipelined_train_step(model, tx, aug_fn, dim=3),
                   donate_argnums=(0, 1))
    data = jax.device_put(jax.tree.map(jnp.asarray, synthetic_luna_batch(batch)))

    lr = jnp.float32(1e-3)
    epoch = jnp.int32(0)
    t_c0 = time.perf_counter()
    try:  # a compile FAIL (scoped-VMEM or HBM OOM) is itself a matrix result
        views = aug(jax.random.key(999), data)
        for i in range(WARMUP):
            state, metrics, views = pipe(state, views, data, jax.random.key(i),
                                         jax.random.key(1000 + i), lr, epoch)
        sync(metrics)
    except Exception as e:
        msg = repr(e)
        key = msg.find("Ran out of memory")
        return {"config": name, "batch": batch, "remat": remat,
                "headconv": headconv,
                "error": msg[key:key + 120] if key >= 0 else msg[:400]}
    sync(state.params)
    compile_s = time.perf_counter() - t_c0

    trials = []
    for t in range(TRIALS):
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, metrics, views = pipe(state, views, data,
                                         jax.random.key(100 + t * STEPS + i),
                                         jax.random.key(2000 + t * STEPS + i),
                                         lr, epoch)
        sync(metrics)
        sync(state.params)
        trials.append(batch * STEPS / (time.perf_counter() - t0))
    trials.sort()
    return {"config": name, "batch": batch, "remat": remat,
            "headconv": headconv, "vols_per_s": round(trials[len(trials) // 2], 3),
            "trials": [round(x, 3) for x in trials],
            "warm_compile_s": round(compile_s, 1)}


def main():
    configs = [parse(a) for a in sys.argv[1:]] or DEFAULT_CONFIGS
    for cfg in configs:
        res = measure(*cfg)
        line = json.dumps(res)
        print(line, flush=True)
        with open("/tmp/bench_matrix_r4.jsonl", "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
