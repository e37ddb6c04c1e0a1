"""Subprocess worker for tests/test_multihost.py — one of two localhost
"hosts" running the fused train step over a global 4-device CPU mesh.

Exercises the real ``--multihost`` code path (``cli/main.py`` →
``core.mesh.init_distributed`` + ``shard_batch``'s
``make_array_from_process_local_data`` assembly) without TPU pods: gloo
cross-process collectives on the CPU backend, 2 processes × 2 virtual
devices.  The reference has no multi-node story at all (single-process
``nn.DataParallel``, reference ``train_2d.py:75``).

Usage: python tests/multihost_worker.py RANK PORT OUT_NPZ [WORLD]

``WORLD`` (default 2) generalizes the test to N localhost "hosts" × 2
virtual devices each — the 3-process case pins that nothing in the stack
is secretly pairwise (collective reductions, process slicing, global-array
assembly all generalize).
"""

import os
import sys


def global_views(batch: int = 4):
    """Deterministic global-batch views at dryrun-tiny shapes."""
    import numpy as np

    rng = np.random.RandomState(0)
    return {
        "x1": rng.rand(batch, 16, 16, 8, 1).astype(np.float32),
        "x2": rng.rand(batch, 16, 16, 8, 1).astype(np.float32),
        "gt": rng.rand(batch, 16, 16, 8, 1).astype(np.float32),
        "locals": rng.rand(batch, 2, 8, 8, 8, 1).astype(np.float32),
    }


def run_step_single_process(world: int = 2):
    """The single-process reference result (called from the pytest process)."""
    import jax
    import jax.numpy as jnp

    from pcrlv2_tpu.core.precision import PARITY_POLICY
    from pcrlv2_tpu.models import PCRLv23d
    from pcrlv2_tpu.train.optimizer import sgd
    from pcrlv2_tpu.train.step import create_train_state, make_train_step

    batch = 2 * world
    # f32 parity policy: bf16 compute rounds differently under different
    # shardings, which is exactly the noise this equivalence test excludes
    model = PCRLv23d(policy=PARITY_POLICY)
    tx = sgd()
    sample = jnp.zeros((batch, 16, 16, 8, 1), jnp.float32)
    state = create_train_state(model, tx, jax.random.key(0), sample)
    step = jax.jit(make_train_step(model, tx, dim=3), donate_argnums=(0,))
    new_state, metrics = step(state, global_views(batch), jax.random.key(1),
                              jnp.float32(1e-3), jnp.int32(0))
    return (float(jax.device_get(metrics["loss"])),
            [jax.device_get(l) for l in jax.tree.leaves(new_state.params)])


def main() -> None:
    rank, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    world = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from pcrlv2_tpu.core.mesh import (DATA_AXIS, create_mesh, init_distributed,
                                      replicated_sharding, shard_batch)

    init_distributed(coordinator_address=f"localhost:{port}",
                     num_processes=world, process_id=rank)
    assert jax.process_count() == world and jax.device_count() == 2 * world

    import numpy as np
    import jax.numpy as jnp

    from pcrlv2_tpu.models import PCRLv23d
    from pcrlv2_tpu.train.optimizer import sgd
    from pcrlv2_tpu.train.step import create_train_state, make_train_step

    mesh = create_mesh((DATA_AXIS,))  # all global devices
    from pcrlv2_tpu.core.precision import PARITY_POLICY as _PP

    model = PCRLv23d(policy=_PP)
    tx = sgd()
    sample = jnp.zeros((2 * world, 16, 16, 8, 1), jnp.float32)
    # each process initializes from the same key → identical replicated state
    state = create_train_state(model, tx, jax.random.key(0), sample)
    state = jax.device_put(state, replicated_sharding(mesh))

    # each process feeds its CONTIGUOUS local slice; shard_batch assembles
    # the global batch (P('data') over [proc r: rows 2r..2r+1])
    views = global_views(2 * world)
    local = {k: v[rank * 2:(rank + 1) * 2] for k, v in views.items()}
    batch = shard_batch(mesh, local)

    step = jax.jit(make_train_step(model, tx, dim=3), donate_argnums=(0,))
    new_state, metrics = step(state, batch, jax.random.key(1),
                              jnp.float32(1e-3), jnp.int32(0))
    loss = float(jax.device_get(metrics["loss"]))
    if rank == 0:
        leaves = [np.asarray(jax.device_get(l))
                  for l in jax.tree.leaves(new_state.params)]
        np.savez(out, loss=np.float32(loss),
                 **{f"leaf{i}": l for i, l in enumerate(leaves)})
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
