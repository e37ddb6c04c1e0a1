"""Multi-host (``--multihost``) without a cluster: two localhost processes,
``jax.distributed.initialize`` on the CPU backend (gloo collectives),
``shard_batch``'s ``make_array_from_process_local_data`` assembly, one fused
train step — asserted equal to the single-process result.

This pins the ``cli/main.py`` ``--multihost`` data path that round 1 labeled
"untestable single-host" (it isn't), plus the per-process list slicing.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TESTS_DIR)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_step_world(tmp_path, world: int):
    """N gloo processes × 2 virtual devices run the fused step on a global
    batch of 2N; rank 0 saves loss + params for comparison against the
    single-process reference."""
    port = _free_port()
    out = tmp_path / "rank0.npz"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(TESTS_DIR, "multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(r), str(port), str(out), str(world)],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in range(world)]
    outs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(stdout.decode(errors="replace"))
    for r, (p, text) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{text[-3000:]}"
    got = np.load(out)

    from tests.multihost_worker import run_step_single_process

    ref_loss, ref_leaves = run_step_single_process(world)
    # f32 everywhere; the 2N-way psum reorders accumulation → ~2e-5 rel
    np.testing.assert_allclose(float(got["loss"]), ref_loss,
                               rtol=1e-4, atol=1e-6)
    assert len(ref_leaves) == len([k for k in got.files if k != "loss"])
    for i, ref in enumerate(ref_leaves):
        ref = np.asarray(ref)
        # Both runs start from identical init (same PRNG key), so leaves
        # differ only by lr·(grad difference).  Grads are cancellation-
        # dominated sums over ~8k voxel positions, where the N-way psum's
        # different accumulation order leaves ABSOLUTE noise on the grad
        # (measured ≲6e-2, i.e. ≲6e-5 on the weight after lr=1e-3) — hence
        # a flat atol at that scale rather than a relative bound.  A
        # semantic bug (missing/mis-normalized psum) would show at the full
        # lr·grad scale ~1e-3, an order of magnitude above this tolerance.
        np.testing.assert_allclose(
            got[f"leaf{i}"], ref, rtol=1e-4, atol=2e-4,
            err_msg=f"param leaf {i} diverges between {world}-process and "
                    f"single-process runs")


def test_two_process_step_matches_single_process(tmp_path):
    _run_step_world(tmp_path, 2)


def test_three_process_step_matches_single_process(tmp_path):
    """Three hosts: pins that nothing in the multihost stack is secretly
    pairwise — process slicing, global-array assembly, and the gradient
    reduction all generalize beyond world=2 (round-4 weak spot)."""
    _run_step_world(tmp_path, 3)


def _run_trainer_world(tmp_path, world: int):
    """The FULL Trainer loop under N gloo processes: run_training drives
    prefetch + fused steps + the checkpoint cadence on a shared output dir;
    .pt writes are process-0-only; metrics streams are per-process; a fresh
    Trainer resumes the orbax state identically on every rank and keeps
    training.  (Round-4 gap: only a single bare step was multihost-tested.)
    """
    port = _free_port()
    shared = tmp_path / "shared_out"
    shared.mkdir()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(TESTS_DIR, "multihost_trainer_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(r), str(port), str(shared), str(world)],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in range(world)]
    outs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost trainer worker timed out")
        outs.append(stdout.decode(errors="replace"))
    for r, (p, text) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{text[-4000:]}"
        assert "trainer-loop multihost OK" in text
    # rank-0 probe checkpoint written, every other rank's probe refused
    assert any(f.endswith("_98.pt") for f in os.listdir(shared))
    assert not any(f.endswith("_99.pt") for f in os.listdir(shared))


def test_two_process_trainer_epoch_checkpoint_resume(tmp_path):
    _run_trainer_world(tmp_path, 2)


def test_three_process_trainer_epoch_checkpoint_resume(tmp_path):
    """Three hosts: the single-writer property with MULTIPLE refusing
    ranks, and orbax save/restore coordinating across world > 2."""
    _run_trainer_world(tmp_path, 3)


def test_process_slice_trims_to_common_length(monkeypatch):
    """cli._shard_for_process: uneven lists must yield equal per-process
    sample counts (unequal counts deadlock the DCN collectives)."""
    import argparse
    import importlib

    cli = importlib.import_module("pcrlv2_tpu.cli.main")

    args = argparse.Namespace(multihost=True, b=8)
    lst = [f"s{i}" for i in range(7)]  # 7 % 2 != 0
    for rank in (0, 1):
        monkeypatch.setattr(cli, "_process_slice", lambda a, r=rank: (r, 2))
        local, (sliced,) = cli._shard_for_process(args, lst)
        assert len(sliced) == 3  # 7 // 2, both ranks
        assert local.b == 4
