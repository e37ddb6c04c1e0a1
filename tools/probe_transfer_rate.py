"""Pin the H2D-in-the-loop cost: the same saturated pipelined-step loop as
probe_device_rate.py, but each step consumes a FRESH host batch transferred
per step — three feeding strategies:

  resident  — device-resident batch reused (probe_device_rate baseline)
  sync_put  — jax.device_put inline in the dispatch loop (no overlap)
  prefetch  — background thread device_puts into a depth-2 queue (the
              trainer's device_prefetch pattern)

The delta between `resident` and the others is the true per-step transfer
cost as the axon tunnel actually schedules it (raw bandwidth says ~12 ms for
the f16 batch; the e2e runs suggest far more — this probe settles whether
transfers serialize with in-flight compute on the tunnel).

Usage: python tools/probe_transfer_rate.py [b] [K] [dtype=f16|f32]
"""

import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pcrlv2_tpu.data.augment3d import make_luna_aug_fn
from pcrlv2_tpu.data.pipeline import synthetic_luna_batch
from pcrlv2_tpu.models import PCRLv23d
from pcrlv2_tpu.train.optimizer import sgd
from pcrlv2_tpu.train.step import create_train_state, make_pipelined_train_step


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    dt = np.float16 if (len(sys.argv) < 4 or sys.argv[3] == "f16") else np.float32

    model = PCRLv23d()
    tx = sgd()
    state = create_train_state(model, tx, jax.random.key(0),
                               jnp.zeros((b, 64, 64, 32, 1), jnp.float32))
    aug_fn = make_luna_aug_fn()
    pipe = jax.jit(make_pipelined_train_step(model, tx, aug_fn, dim=3),
                   donate_argnums=(0, 1))
    host = {kk: np.asarray(v, dt)
            for kk, v in synthetic_luna_batch(b).items()}
    nbytes = sum(v.nbytes for v in host.values())
    resident = jax.device_put(host)
    lr, epoch = jnp.float32(1e-3), jnp.int32(0)

    def sync(x):
        return jax.device_get(jax.tree.leaves(x)[0].ravel()[0:1])

    views = jax.jit(aug_fn)(jax.random.key(999), resident)
    for i in range(3):
        state, metrics, views = pipe(state, views, resident, jax.random.key(i),
                                     jax.random.key(1000 + i), lr, epoch)
    sync(metrics); sync(state.params)

    def run(label, feed_iter):
        nonlocal state, views
        t0 = time.perf_counter()
        for i in range(k):
            feed = next(feed_iter)
            state, metrics, views = pipe(state, views, feed,
                                         jax.random.key(100 + i),
                                         jax.random.key(2000 + i), lr, epoch)
        sync(metrics)
        t = time.perf_counter() - t0
        print(f"{label:9s}  {t:7.3f}s  {1e3*t/k:7.1f} ms/step  "
              f"-> {b*k/t:6.2f} vols/s", flush=True)

    def resident_iter():
        while True:
            yield resident

    def sync_put_iter():
        while True:
            yield jax.device_put(host)

    def prefetch_iter(depth=2):
        q: queue.Queue = queue.Queue(maxsize=depth)

        def worker():
            while True:
                q.put(jax.device_put(host))

        threading.Thread(target=worker, daemon=True).start()
        while True:
            yield q.get()

    print(f"b={b} K={k} dtype={np.dtype(dt).name} batch={nbytes/2**20:.1f} MB")
    for label, it in (("resident", resident_iter()),
                      ("sync_put", sync_put_iter()),
                      ("prefetch", prefetch_iter()),
                      ("resident2", resident_iter())):
        run(label, it)


if __name__ == "__main__":
    main()
