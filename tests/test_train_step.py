"""End-to-end fused train step on tiny synthetic data (SURVEY.md §4
integration tier): losses finite, params update, optimizer semantics match
torch SGD, and the finite-loss guard actually skips."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pcrlv2_tpu.core.precision import PARITY_POLICY
from pcrlv2_tpu.models import PCRLv23d
from pcrlv2_tpu.train.optimizer import apply_lr, cosine_lr, sgd
from pcrlv2_tpu.train.step import TrainState, create_train_state, make_train_step


def tiny_batch(b=2, size=(16, 16, 8), local=(8, 8, 8), n_views=2, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "x1": jnp.asarray(rng.rand(b, *size, 1).astype(np.float32)),
        "x2": jnp.asarray(rng.rand(b, *size, 1).astype(np.float32)),
        "gt": jnp.asarray(rng.rand(b, *size, 1).astype(np.float32)),
        "locals": jnp.asarray(rng.rand(b, n_views, *local, 1).astype(np.float32)),
    }


@pytest.fixture(scope="module")
def setup():
    model = PCRLv23d(policy=PARITY_POLICY)
    tx = sgd(momentum=0.9, weight_decay=1e-4)
    state = create_train_state(model, tx, jax.random.key(0),
                               jnp.zeros((2, 16, 16, 8, 1)))
    step = jax.jit(make_train_step(model, tx, dim=3))
    return model, tx, state, step


def test_step_runs_and_updates(setup):
    _, _, state, step = setup
    batch = tiny_batch()
    new_state, metrics = step(state, batch, jax.random.key(1),
                              jnp.float32(1e-3), jnp.int32(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["skipped"]) == 0.0
    assert int(new_state.step) == 1
    # total assembles the 4 terms (train_3d.py:138)
    np.testing.assert_allclose(
        float(metrics["loss"]),
        float(metrics["mg_loss"]) + float(metrics["cos_loss"])
        + float(metrics["mask_loss"]) + float(metrics["local_loss"]),
        rtol=1e-5,
    )
    # params actually moved
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params)
    assert max(jax.tree.leaves(diffs)) > 0

    # second step with a different key keeps going
    new_state2, metrics2 = step(new_state, tiny_batch(seed=1), jax.random.key(2),
                                jnp.float32(1e-3), jnp.int32(0))
    assert np.isfinite(float(metrics2["loss"]))
    assert int(new_state2.step) == 2


def test_nan_guard_skips_update(setup):
    _, _, state, step = setup
    batch = tiny_batch()
    batch["gt"] = batch["gt"].at[0, 0, 0, 0, 0].set(jnp.nan)
    new_state, metrics = step(state, batch, jax.random.key(1),
                              jnp.float32(1e-3), jnp.int32(20))
    assert float(metrics["skipped"]) == 1.0
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the reference's `continue` advances nothing (train_3d.py:140-142): a
    # skipped update leaves EVERY leaf — incl. the int32 step — unchanged
    assert int(new_state.step) == 0


def test_sgd_matches_torch_two_steps():
    """Our sgd(chain) + apply_lr == torch.optim.SGD(momentum, weight_decay)."""
    w0 = np.array([1.0, -2.0, 3.0], dtype=np.float32)
    g1 = np.array([0.1, 0.2, -0.3], dtype=np.float32)
    g2 = np.array([-0.2, 0.1, 0.4], dtype=np.float32)
    lr, mom, wd = 0.01, 0.9, 1e-4

    tp = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([tp], lr=lr, momentum=mom, weight_decay=wd)
    for g in (g1, g2):
        opt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        opt.step()

    tx = sgd(momentum=mom, weight_decay=wd)
    params = jnp.asarray(w0)
    opt_state = tx.init(params)
    for g in (g1, g2):
        updates, opt_state = tx.update(jnp.asarray(g), opt_state, params)
        params = params + apply_lr(updates, lr)

    np.testing.assert_allclose(np.asarray(params), tp.detach().numpy(),
                               rtol=1e-6, atol=1e-7)


def test_cosine_lr_matches_reference():
    """utils.py:111-112: lr·0.5·(1+cos(π·epoch/epochs))."""
    import math
    for epoch in [0, 60, 120, 240]:
        ref = 1e-3 * 0.5 * (1.0 + math.cos(math.pi * epoch / 240))
        np.testing.assert_allclose(float(cosine_lr(epoch, 1e-3, 240)), ref,
                                   rtol=1e-6)


def test_pipelined_step_matches_sequential():
    """The step+next-aug fused program must reproduce the sequential
    aug-then-step trajectory (same ops and keys; only the schedule differs)."""
    import numpy as np

    from pcrlv2_tpu.data.augment3d import make_luna_aug_fn
    from pcrlv2_tpu.data.pipeline import synthetic_luna_batch
    from pcrlv2_tpu.models import PCRLv23d
    from pcrlv2_tpu.train.optimizer import sgd
    from pcrlv2_tpu.train.step import (create_train_state,
                                       make_pipelined_train_step,
                                       make_train_step)

    model = PCRLv23d()
    tx = sgd()
    b = 2
    state0 = create_train_state(model, tx, jax.random.key(0),
                                jnp.zeros((b, 16, 16, 8, 1)))
    aug = make_luna_aug_fn()
    raws = [jax.tree.map(jnp.asarray, synthetic_luna_batch(
        b, seed=i, size=(16, 16, 8), local=(8, 8, 8), n_views=2))
        for i in range(3)]

    lr, epoch = jnp.float32(1e-2), jnp.int32(0)
    kstep = [jax.random.key(10 + i) for i in range(3)]
    kaug = [jax.random.key(20 + i) for i in range(3)]

    seq = jax.jit(make_train_step(model, tx, dim=3, aug_fn=None))
    aug_j = jax.jit(aug)
    s = state0
    for i in range(3):
        s, m = seq(s, aug_j(kaug[i], raws[i]), kstep[i], lr, epoch)

    pipe = jax.jit(make_pipelined_train_step(model, tx, aug, dim=3))
    s2 = state0
    views = aug_j(kaug[0], raws[0])
    for i in range(3):
        nxt = raws[min(i + 1, 2)]
        knxt = kaug[min(i + 1, 2)]
        s2, m2, views = pipe(s2, views, nxt, kstep[i], knxt, lr, epoch)

    for a, c in zip(jax.tree.leaves(s.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-6)


def test_native_masks_match_upsampled(setup):
    """A model with ``upsample_masks=False`` (lazy deep-supervision upsample,
    ``lax.switch`` in the loss) takes the EXACT same training step as the
    reference-API model — unselected levels' grads are zero either way."""
    _, tx, state, step = setup
    model_lazy = PCRLv23d(policy=PARITY_POLICY, upsample_masks=False)
    step_lazy = jax.jit(make_train_step(model_lazy, tx, dim=3))

    batch = tiny_batch()
    for seed in (1, 5):  # different keys sample different mask levels
        ref_state, ref_metrics = step(state, batch, jax.random.key(seed),
                                      jnp.float32(1e-3), jnp.int32(0))
        lazy_state, lazy_metrics = step_lazy(state, batch,
                                             jax.random.key(seed),
                                             jnp.float32(1e-3), jnp.int32(0))
        np.testing.assert_allclose(float(lazy_metrics["loss"]),
                                   float(ref_metrics["loss"]),
                                   rtol=1e-6, atol=1e-7)
        assert int(lazy_metrics["level"]) == int(ref_metrics["level"])
        for a, b in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(lazy_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


def test_tapmajor_head_conv_matches_default_step(setup, monkeypatch):
    """A full fused train step with PCRL_HEADCONV=tapA/tapD (tap-major Co=1
    deep-supervision head, ops/head_conv.py) matches the default XLA-conv
    step at every parameter leaf (f32 parity policy)."""
    model, tx, state, step = setup
    batch = tiny_batch()
    ref_state, ref_metrics = step(state, batch, jax.random.key(3),
                                  jnp.float32(1e-3), jnp.int32(0))
    for variant in ("tapA", "tapD", "tapP"):
        monkeypatch.setenv("PCRL_HEADCONV", variant)
        # fresh trace so the env gate is re-read
        step_tap = jax.jit(make_train_step(model, tx, dim=3))
        tap_state, tap_metrics = step_tap(state, batch, jax.random.key(3),
                                          jnp.float32(1e-3), jnp.int32(0))
        np.testing.assert_allclose(float(tap_metrics["loss"]),
                                   float(ref_metrics["loss"]),
                                   rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(tap_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
