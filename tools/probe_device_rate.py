"""Pin the DEVICE-side step rate with saturated loops of varying depth.

bench.py times WARMUP + trials×STEPS pipelined steps with one trailing sync
per trial; the trainer's BT meter is true wall time per log window.  This
probe measures the same jitted pipelined program (device-resident synthetic
batch, zero H2D) at several queue depths K, each timed from first dispatch to
a device_get of the final step's metrics — the unambiguous wall-clock truth.

Also times each *dispatch* (host-side call) to expose tunnel RPC overhead.

Usage: python tools/probe_device_rate.py [b] [Ks...]   (default b=32, K=10 20 60)
       PROBE_DIM=2 python tools/probe_device_rate.py 64   (2D chest pipeline)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcrlv2_tpu.utils import chiplock

_lock = chiplock.guard_exclusive("probe_device_rate")  # timing run: refuse a busy chip

import jax
import jax.numpy as jnp

from pcrlv2_tpu.train.optimizer import sgd
from pcrlv2_tpu.train.step import create_train_state, make_pipelined_train_step

DIM = int(os.environ.get("PROBE_DIM", "3"))


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else (32 if DIM == 3 else 64)
    ks = [int(x) for x in sys.argv[2:]] or [10, 20, 60]

    tx = sgd()
    if DIM == 3:
        from pcrlv2_tpu.data.augment3d import make_luna_aug_fn
        from pcrlv2_tpu.data.pipeline import synthetic_luna_batch
        from pcrlv2_tpu.models import PCRLv23d

        model = PCRLv23d()
        sample = jnp.zeros((b, 64, 64, 32, 1), jnp.float32)
        aug_fn = make_luna_aug_fn()
        batch = synthetic_luna_batch(b)
        unit = "vols/s"
    else:
        from pcrlv2_tpu.data.augment2d import make_chest_aug_fn
        from pcrlv2_tpu.data.pipeline import synthetic_chest_batch
        from pcrlv2_tpu.models import PCRLv2

        model = PCRLv2()
        sample = jnp.zeros((b, 224, 224, 3), jnp.float32)
        aug_fn = make_chest_aug_fn()
        batch = synthetic_chest_batch(b)
        unit = "imgs/s"
    state = create_train_state(model, tx, jax.random.key(0), sample)
    loss_guard = 1000.0 if DIM == 3 else None
    pipe = jax.jit(make_pipelined_train_step(model, tx, aug_fn, dim=DIM,
                                             loss_guard=loss_guard),
                   donate_argnums=(0, 1))
    batch = jax.device_put(jax.tree.map(jnp.asarray, batch))
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
              f"  -> {b*k/t_all:6.2f} {unit}  "
              f"(max dispatch {1e3*max(disp):.0f} ms)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
