"""Evaluation pass: the trainer computes the 4-term loss on un-corrupted
views without touching the train state (the reference's eval loader is built
but would crash if iterated — reference ``data.py:59``, ``lunaDataset.py:37``)."""

import numpy as np

import jax
import jax.numpy as jnp

from pcrlv2_tpu.models import PCRLv23d
from pcrlv2_tpu.train.trainer import TrainConfig, Trainer


def test_evaluate_runs_and_preserves_state(tmp_path):
    cfg = TrainConfig(b=2, output=str(tmp_path), seed=0)
    model = PCRLv23d()
    sample = jnp.zeros((2, 16, 16, 8, 1), jnp.float32)
    trainer = Trainer(model, cfg, aug_fn=None, dim=3, sample_batch=sample)

    params_before = jax.tree.map(np.asarray, trainer.state.params)

    rng = np.random.RandomState(0)
    batches = [{
        "pair": rng.rand(2, 2, 16, 16, 8).astype(np.float32),
        "locals": rng.rand(2, 6, 8, 8, 8).astype(np.float32),
    } for _ in range(2)]
    stats = trainer.evaluate(iter(batches))

    assert set(stats) == {"loss", "mg_loss", "cos_loss", "local_loss"}
    assert np.isfinite(stats["loss"])
    # identity restoration on clean views: mg term is model-vs-input MSE,
    # bounded by 1 for [0,1] data through a sigmoid head
    assert 0.0 <= stats["mg_loss"] <= 1.0
    # eval must not mutate the train state
    for a, b in zip(jax.tree.leaves(params_before),
                    jax.tree.leaves(trainer.state.params)):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_evaluate_ragged_tail_under_mesh(tmp_path):
    """drop_last=False eval loaders can yield a tail batch that does not
    divide the mesh's data axis; the pretask eval consumes it via the
    unsharded-put fallback and weights per-batch means by batch size —
    [4]+[2] equals one [6] batch."""
    from pcrlv2_tpu.core.mesh import DATA_AXIS, create_mesh

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs >=4 virtual devices")
    mesh = create_mesh((DATA_AXIS,), shape=(4,), devices=jax.devices()[:4])
    cfg = TrainConfig(b=4, output=str(tmp_path), seed=0)
    model = PCRLv23d()
    sample = jnp.zeros((4, 16, 16, 8, 1), jnp.float32)
    trainer = Trainer(model, cfg, aug_fn=None, dim=3, sample_batch=sample,
                      mesh=mesh)
    rng = np.random.RandomState(2)
    pair = rng.rand(6, 2, 16, 16, 8).astype(np.float32)
    loc = rng.rand(6, 6, 8, 8, 8).astype(np.float32)
    whole = [{"pair": pair, "locals": loc}]
    split = [{"pair": pair[:4], "locals": loc[:4]},
             {"pair": pair[4:], "locals": loc[4:]}]  # tail of 2: 2 % 4 != 0
    s_whole = trainer.evaluate(iter(whole))
    s_split = trainer.evaluate(iter(split))
    # exact decomposition is impossible here: the cos/local terms sample a
    # decoder level from a PER-BATCH-INDEX key, and the 4-term loss runs
    # with train-mode BN batch statistics (batch-composition dependent,
    # measured ~0.3% on the mg term).  The contract under test is that the
    # ragged tail is CONSUMED (not crashed on, not dropped) and the
    # size-weighted mean stays close on the restoration term.
    np.testing.assert_allclose(s_split["mg_loss"], s_whole["mg_loss"],
                               rtol=0.02)
    for k in s_whole:
        assert np.isfinite(s_split[k])


def test_evaluate_deterministic(tmp_path):
    cfg = TrainConfig(b=2, output=str(tmp_path), seed=0)
    model = PCRLv23d()
    sample = jnp.zeros((2, 16, 16, 8, 1), jnp.float32)
    trainer = Trainer(model, cfg, aug_fn=None, dim=3, sample_batch=sample)
    rng = np.random.RandomState(1)
    batches = [{
        "pair": rng.rand(2, 2, 16, 16, 8).astype(np.float32),
        "locals": rng.rand(2, 6, 8, 8, 8).astype(np.float32),
    }]
    s1 = trainer.evaluate(iter(batches))
    s2 = trainer.evaluate(iter(batches))
    assert s1 == s2


def test_resume_continues_from_saved_epoch(tmp_path):
    """--resume must continue after the saved epoch with the restored global
    step — not restart schedules from 0 (reference has no resume at all)."""
    cfg = TrainConfig(b=2, output=str(tmp_path), seed=0,
                      orbax_dir=str(tmp_path / "orbax"))
    model = PCRLv23d()
    sample = jnp.zeros((2, 16, 16, 8, 1), jnp.float32)
    trainer = Trainer(model, cfg, aug_fn=None, dim=3, sample_batch=sample)

    rng = np.random.RandomState(0)
    views = {
        "x1": rng.rand(2, 16, 16, 8, 1).astype(np.float32),
        "x2": rng.rand(2, 16, 16, 8, 1).astype(np.float32),
        "gt": rng.rand(2, 16, 16, 8, 1).astype(np.float32),
        "gt2": rng.rand(2, 16, 16, 8, 1).astype(np.float32),
        "locals": rng.rand(2, 6, 8, 8, 8, 1).astype(np.float32),
    }
    trainer.train_epoch(0, iter([views, views]))
    assert trainer._global_step == 2
    trainer.save_orbax(epoch=7)

    trainer2 = Trainer(model, cfg, aug_fn=None, dim=3, sample_batch=sample)
    saved_epoch = trainer2.restore_orbax()
    assert saved_epoch == 7
    assert trainer2._global_step == 2
    for a, b in zip(jax.tree.leaves(trainer.state.params),
                    jax.tree.leaves(trainer2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_evaluate_2d_uses_aug_views(tmp_path):
    """2D eval builds views through the augmentation pipeline under a fixed
    key (the reference's chest eval loader aliases the train pipeline,
    reference data.py:58-59) and is deterministic."""
    from pcrlv2_tpu.data.augment2d import make_chest_aug_fn
    from pcrlv2_tpu.models import PCRLv2

    cfg = TrainConfig(b=2, d=2, output=str(tmp_path), seed=0)
    model = PCRLv2()
    sample = jnp.zeros((2, 64, 64, 3), jnp.float32)
    aug = make_chest_aug_fn(n_local=2, global_size=64, local_size=32)
    trainer = Trainer(model, cfg, aug_fn=aug, dim=2, sample_batch=sample)

    rng = np.random.RandomState(0)
    batches = [{"image": rng.rand(2, 96, 96, 3).astype(np.float32)}]
    s1 = trainer.evaluate(iter(batches))
    s2 = trainer.evaluate(iter(batches))
    assert np.isfinite(s1["loss"])
    assert s1 == s2


def test_save_every_extra_ckpt_cadence(tmp_path):
    """--save_every N adds Orbax checkpoints every N epochs on top of the
    reference cadence (epoch%100==0 or 240, reference train_3d.py:71-80);
    .pt artifacts still only land on reference epochs."""
    import os

    from pcrlv2_tpu.train.trainer import run_training

    cfg = TrainConfig(b=2, output=str(tmp_path), seed=0, epochs=5,
                      save_every=2, orbax_dir=str(tmp_path / "orbax"))
    model = PCRLv23d()
    sample = jnp.zeros((2, 16, 16, 8, 1), jnp.float32)

    rng = np.random.RandomState(0)
    views = {
        "x1": rng.rand(2, 16, 16, 8, 1).astype(np.float32),
        "x2": rng.rand(2, 16, 16, 8, 1).astype(np.float32),
        "gt": rng.rand(2, 16, 16, 8, 1).astype(np.float32),
        "gt2": rng.rand(2, 16, 16, 8, 1).astype(np.float32),
        "locals": rng.rand(2, 6, 8, 8, 8, 1).astype(np.float32),
    }

    class Loader:
        def epoch(self, e):
            return iter([views])

    run_training(model, cfg, Loader(), aug_fn=None, dim=3,
                 sample_batch=sample, epochs=3)
    steps = {int(d) for d in os.listdir(tmp_path / "orbax") if d.isdigit()}
    assert steps == {0, 2}  # epoch 0 (reference cadence) + epoch 2 (N=2)
    pts = [f for f in os.listdir(tmp_path) if f.endswith(".pt")]
    assert [f for f in pts if "_0.pt" in f] and len(pts) == 1
