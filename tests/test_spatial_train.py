"""The depth-sharded TRAIN step must match the unsharded fused step exactly:
same loss, same gradients (via the post-step parameters), same BN statistics —
on the virtual CPU mesh, for both a pure-spatial mesh and a data x spatial
mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcrlv2_tpu.core.mesh import DATA_AXIS, SPATIAL_AXIS, create_mesh
from pcrlv2_tpu.core.precision import PARITY_POLICY
from pcrlv2_tpu.models import PCRLv23d
from pcrlv2_tpu.parallel.spatial_train import make_spatial_train_step, shard_views
from pcrlv2_tpu.train.optimizer import sgd
from pcrlv2_tpu.train.step import create_train_state, make_train_step


B, D, H, W, V = 4, 32, 16, 8, 2  # D divides by max-spatial-shards (4) x 8


def _views(seed=0):
    rng = np.random.RandomState(seed)
    f = lambda *s: rng.rand(*s).astype(np.float32)
    return {
        "x1": f(B, D, H, W, 1),
        "x2": f(B, D, H, W, 1),
        "gt": f(B, D, H, W, 1),
        "locals": f(B, V, 8, 8, 8, 1),
    }


@pytest.fixture(scope="module")
def setup():
    model = PCRLv23d(policy=PARITY_POLICY)
    tx = sgd(momentum=0.9, weight_decay=1e-4)
    sample = jnp.zeros((B, D, H, W, 1), jnp.float32)
    state = create_train_state(model, tx, jax.random.key(0), sample)

    ref_step = jax.jit(make_train_step(model, tx, dim=3, aug_fn=None))
    views = _views()
    key = jax.random.key(7)
    lr, epoch = jnp.float32(1e-2), jnp.int32(3)
    ref_state, ref_metrics = ref_step(state, views, key, lr, epoch)
    return model, tx, state, views, key, lr, epoch, ref_state, ref_metrics


@pytest.mark.parametrize("shape", [(1, 4), (2, 2)])
def test_spatial_step_matches_unsharded(setup, shape):
    model, tx, state, views, key, lr, epoch, ref_state, ref_metrics = setup
    n = shape[0] * shape[1]
    if jax.device_count() < n:
        pytest.skip("needs 4 virtual devices")
    mesh = create_mesh((DATA_AXIS, SPATIAL_AXIS), shape=shape,
                       devices=jax.devices()[:n])

    step = jax.jit(make_spatial_train_step(model, tx, mesh))
    sharded = shard_views(views, mesh)
    got_state, got_metrics = step(state, sharded, key, lr, epoch)

    for k in ("loss", "mg_loss", "cos_loss", "local_loss", "mask_loss"):
        np.testing.assert_allclose(float(got_metrics[k]),
                                   float(ref_metrics[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)
    assert int(got_metrics["level"]) == int(ref_metrics["level"])

    flat_got = jax.tree_util.tree_flatten_with_path(got_state.params)[0]
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref_state.params)[0])
    # post-update params equal => gradients equal (SGD is injective in grads)
    for path, leaf in flat_got:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_ref[path]),
            rtol=2e-4, atol=5e-5, err_msg=jax.tree_util.keystr(path))

    flat_got = jax.tree_util.tree_flatten_with_path(got_state.batch_stats)[0]
    flat_ref = dict(
        jax.tree_util.tree_flatten_with_path(ref_state.batch_stats)[0])
    for path, leaf in flat_got:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_ref[path]),
            rtol=2e-4, atol=5e-5, err_msg="stats " + jax.tree_util.keystr(path))


def test_spatial_step_guard_skips_nonfinite(setup):
    model, tx, state, views, key, lr, epoch, *_ = setup
    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = create_mesh((DATA_AXIS, SPATIAL_AXIS), shape=(2, 2),
                       devices=jax.devices()[:4])
    step = jax.jit(make_spatial_train_step(model, tx, mesh))
    bad = dict(views)
    bad["gt"] = np.full_like(views["gt"], np.nan)
    got_state, metrics = step(state, shard_views(bad, mesh), key, lr, epoch)
    assert float(metrics["skipped"]) == 1.0
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(got_state.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]))


def test_spatial_eval_matches_unsharded(setup):
    """make_spatial_eval_fn must reproduce the unsharded loss metrics."""
    from pcrlv2_tpu.parallel.spatial_train import make_spatial_eval_fn
    from pcrlv2_tpu.train.step import make_loss_fn

    model, tx, state, views, key, lr, epoch, *_ = setup
    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = create_mesh((DATA_AXIS, SPATIAL_AXIS), shape=(2, 2),
                       devices=jax.devices()[:4])
    eval_fn = jax.jit(make_spatial_eval_fn(model, mesh))
    got = eval_fn(state.params, state.batch_stats, shard_views(views, mesh),
                  key)
    loss_fn = make_loss_fn(model, dim=3)
    _, (_, ref) = jax.jit(loss_fn)(state.params, state.batch_stats, views,
                                   key, jnp.int32(0))
    for k in ("loss", "mg_loss", "cos_loss", "local_loss"):
        np.testing.assert_allclose(float(got[k]), float(ref[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)
