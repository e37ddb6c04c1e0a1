"""Subprocess worker for the full-Trainer multihost test — one of two
localhost "hosts" driving the REAL epoch loop (``run_training``: prefetch →
fused steps → checkpoint cadence) over a global 4-device CPU mesh with gloo
collectives, then proving single-writer checkpoints and a working resume.

This closes the round-4 gap: the two-process test covered global-batch
assembly + one fused step, but not the Trainer epoch loop, checkpoint
single-writer behavior, or resume under ``--multihost``.

Usage: python tests/multihost_trainer_worker.py RANK PORT SHARED_OUT [WORLD]

``WORLD`` (default 2) runs the same loop over N localhost "hosts" — with
3+ the single-writer property is tested with MULTIPLE refusing ranks.
"""

import os
import sys


def main() -> None:
    rank, port, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    world = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from pcrlv2_tpu.core.mesh import DATA_AXIS, create_mesh, init_distributed

    init_distributed(coordinator_address=f"localhost:{port}",
                     num_processes=world, process_id=rank)
    assert jax.process_count() == world and jax.device_count() == 2 * world

    import numpy as np
    import jax.numpy as jnp

    from pcrlv2_tpu.core.precision import PARITY_POLICY
    from pcrlv2_tpu.models import PCRLv23d
    from pcrlv2_tpu.train.trainer import TrainConfig, run_training

    mesh = create_mesh((DATA_AXIS,))  # all 4 global devices

    gb = 2 * world  # global batch: 2 samples per "host"

    class LocalLoader:
        """Each process feeds its CONTIGUOUS local slice of a deterministic
        global batch (2 per process), 2 steps per epoch."""

        def __init__(self, rank: int, n_batches: int = 2):
            self.rank = rank
            self.n_batches = n_batches

        def epoch(self, epoch: int):
            for b in range(self.n_batches):
                rng = np.random.RandomState(1000 * epoch + b)
                views = {
                    "x1": rng.rand(gb, 16, 16, 8, 1).astype(np.float32),
                    "x2": rng.rand(gb, 16, 16, 8, 1).astype(np.float32),
                    "gt": rng.rand(gb, 16, 16, 8, 1).astype(np.float32),
                    "locals": rng.rand(gb, 2, 8, 8, 8, 1).astype(np.float32),
                }
                yield {k: v[self.rank * 2:(self.rank + 1) * 2]
                       for k, v in views.items()}

    cfg = TrainConfig(d=3, b=gb, epochs=240, lr=1e-3, seed=0, amp=False,
                      output=out_dir, orbax_dir=os.path.join(out_dir, "orbax"),
                      save_every=1, log_every=1)
    model = PCRLv23d(policy=PARITY_POLICY)
    sample = jnp.zeros((gb, 16, 16, 8, 1), jnp.float32)

    trainer = run_training(model, cfg, LocalLoader(rank), None, dim=3,
                           sample_batch=sample, mesh=mesh, epochs=1)

    # --- single-writer .pt checkpoints -----------------------------------
    # run_training's reference cadence wrote the epoch-0 .pt; only rank 0
    # may have produced it, and a direct save on rank 1 must refuse.
    pt0 = os.path.join(out_dir, cfg.ckpt_name(0))
    assert os.path.exists(pt0), f"epoch-0 .pt missing: {pt0}"
    probe_epoch = 98 if rank == 0 else 99
    res = trainer.save_reference_ckpt(probe_epoch)
    if rank == 0:
        assert res is not None and os.path.exists(res)
    else:
        assert res is None, "rank 1 wrote a reference checkpoint"
        assert not os.path.exists(os.path.join(out_dir,
                                               cfg.ckpt_name(probe_epoch)))

    # per-process metrics streams: canonical file for rank 0, rank-suffixed
    # for the others (no interleaved writes into one shared file)
    me = os.path.join(out_dir, "metrics.jsonl" if rank == 0
                      else f"metrics.rank{rank}.jsonl")
    assert os.path.exists(me), f"metrics stream missing: {me}"

    # --- resume across both processes ------------------------------------
    # a FRESH trainer restores the save-every-1 orbax state on both ranks;
    # the restored epoch + global step and parameters must match the live
    # trainer exactly (this is the --resume path of run_training).
    from pcrlv2_tpu.train.trainer import Trainer

    cfg2 = TrainConfig(d=3, b=gb, epochs=240, lr=1e-3, seed=0, amp=False,
                       output=os.path.join(out_dir, f"resume{rank}"),
                       orbax_dir=cfg.orbax_dir, log_every=1)
    t2 = Trainer(model, cfg2, None, dim=3, sample_batch=sample, mesh=mesh)
    saved_epoch = t2.restore_orbax()
    assert saved_epoch == 1, f"latest orbax step {saved_epoch} != 1"
    assert t2._global_step == trainer._global_step == 4  # 2 epochs × 2 steps
    for a, b in zip(jax.tree.leaves(trainer.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(jax.device_get(a)),
                                      np.asarray(jax.device_get(b)))

    # resumed training continues: one more epoch from the restored state
    stats = t2.train_epoch(2, iter(LocalLoader(rank).epoch(2)))
    assert np.isfinite(stats["loss"])
    print(f"rank {rank}: trainer-loop multihost OK "
          f"(resumed epoch {saved_epoch}, step {t2._global_step})")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
