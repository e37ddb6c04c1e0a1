"""Pin the DEVICE-side step rate with saturated loops of varying depth.

bench.py times WARMUP+20 pipelined steps with one trailing sync; the trainer's
BT meter samples only the boundary iteration of each log window.  The two have
disagreed (bench 61.9 vols/s vs trainer BT suggesting ~100), so this probe
measures the same jitted pipelined program (device-resident synthetic batch,
zero H2D) at several queue depths K, each timed from first dispatch to a
device_get of the final step's metrics — the unambiguous wall-clock truth.

Also times each *dispatch* (host-side call) to expose tunnel RPC overhead.

Usage: python tools/probe_device_rate.py [b] [Ks...]   (default b=32, K=10 20 60)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pcrlv2_tpu.data.augment3d import make_luna_aug_fn
from pcrlv2_tpu.data.pipeline import synthetic_luna_batch
from pcrlv2_tpu.models import PCRLv23d
from pcrlv2_tpu.train.optimizer import sgd
from pcrlv2_tpu.train.step import create_train_state, make_pipelined_train_step


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ks = [int(x) for x in sys.argv[2:]] or [10, 20, 60]

    model = PCRLv23d()
    tx = sgd()
    state = create_train_state(model, tx, jax.random.key(0),
                               jnp.zeros((b, 64, 64, 32, 1), jnp.float32))
    aug_fn = make_luna_aug_fn()
    pipe = jax.jit(make_pipelined_train_step(model, tx, aug_fn, dim=3),
                   donate_argnums=(0, 1))
    batch = jax.device_put(jax.tree.map(jnp.asarray, synthetic_luna_batch(b)))
    lr, epoch = jnp.float32(1e-3), jnp.int32(0)

    def sync(x):
        return jax.device_get(jax.tree.leaves(x)[0].ravel()[0:1])

    views = jax.jit(aug_fn)(jax.random.key(999), batch)
    for i in range(3):  # compile + warm
        state, metrics, views = pipe(state, views, batch, jax.random.key(i),
                                     jax.random.key(1000 + i), lr, epoch)
    sync(metrics); sync(state.params)

    for k in ks:
        disp = []
        t0 = time.perf_counter()
        for i in range(k):
            d0 = time.perf_counter()
            state, metrics, views = pipe(state, views, batch,
                                         jax.random.key(100 + i),
                                         jax.random.key(2000 + i), lr, epoch)
            disp.append(time.perf_counter() - d0)
        t_disp = time.perf_counter() - t0
        sync(metrics)
        t_sync = time.perf_counter() - t0
        sync(state.params)
        t_all = time.perf_counter() - t0
        print(f"K={k:3d}  dispatch {t_disp:7.3f}s ({1e3*t_disp/k:6.1f} ms/step)"
              f"  +metrics_sync {t_sync:7.3f}s  +params_sync {t_all:7.3f}s"
              f"  -> {b*k/t_all:6.2f} vols/s  "
              f"(max dispatch {1e3*max(disp):.0f} ms)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
