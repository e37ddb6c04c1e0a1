"""Spatial (volume-depth) sharding: halo-exchanged ops must equal their
unsharded counterparts on the 8-virtual-device CPU mesh."""

from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from pcrlv2_tpu.core.mesh import SPATIAL_AXIS, create_mesh
from pcrlv2_tpu.ops import conv3d, global_avg_pool, max_pool3d
from pcrlv2_tpu.parallel.spatial import (
    conv3d_local,
    conv3d_spatial,
    global_avg_pool_spatial,
    halo_exchange,
    max_pool3d_spatial,
)


@pytest.fixture(scope="module")
def mesh():
    n = min(4, jax.device_count())
    return create_mesh((SPATIAL_AXIS,), shape=(n,),
                       devices=jax.devices()[:n])


def _rand(key, *shape):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32)


def test_halo_exchange_reconstructs_neighbors(mesh):
    n = mesh.shape[SPATIAL_AXIS]
    x = _rand(0, 2, 8 * n, 4, 4, 3)

    fn = shard_map(partial(halo_exchange, axis_name=SPATIAL_AXIS),
                   mesh=mesh, in_specs=P(None, SPATIAL_AXIS),
                   out_specs=P(None, SPATIAL_AXIS))
    out = np.asarray(fn(x))  # (2, n·(8+2), 4, 4, 3) concatenated shards
    xs = np.asarray(x)
    per = 8 + 2
    for s in range(n):
        shard = out[:, s * per:(s + 1) * per]
        core = xs[:, s * 8:(s + 1) * 8]
        np.testing.assert_array_equal(shard[:, 1:-1], core)
        if s > 0:
            np.testing.assert_array_equal(shard[:, 0], xs[:, s * 8 - 1])
        else:
            np.testing.assert_array_equal(shard[:, 0], 0 * shard[:, 0])
        if s < n - 1:
            np.testing.assert_array_equal(shard[:, -1], xs[:, (s + 1) * 8])
        else:
            np.testing.assert_array_equal(shard[:, -1], 0 * shard[:, -1])


def test_conv3d_spatial_matches_unsharded(mesh):
    n = mesh.shape[SPATIAL_AXIS]
    x = _rand(1, 2, 4 * n, 6, 6, 5)
    w = _rand(2, 3, 3, 3, 5, 7) * 0.2
    b = _rand(3, 7) * 0.1
    sharded = conv3d_spatial(x, w, b, mesh)
    ref = conv3d(x, w, b)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv3d_spatial_is_actually_sharded(mesh):
    """The output must carry the spatial sharding, not be gathered."""
    n = mesh.shape[SPATIAL_AXIS]
    x = jax.device_put(_rand(4, 2, 4 * n, 6, 6, 5),
                       NamedSharding(mesh, P(None, SPATIAL_AXIS)))
    w = _rand(5, 3, 3, 3, 5, 7) * 0.2
    b = jnp.zeros((7,))
    out = jax.jit(lambda x, w, b: conv3d_spatial(x, w, b, mesh))(x, w, b)
    spec = out.sharding.spec
    assert spec[1] == SPATIAL_AXIS, f"output not depth-sharded: {spec}"


def test_pool_and_gap_spatial(mesh):
    n = mesh.shape[SPATIAL_AXIS]
    x = _rand(6, 2, 4 * n, 8, 8, 3)

    pool = shard_map(max_pool3d_spatial, mesh=mesh,
                     in_specs=P(None, SPATIAL_AXIS),
                     out_specs=P(None, SPATIAL_AXIS))
    np.testing.assert_allclose(np.asarray(pool(x)),
                               np.asarray(max_pool3d(x)), rtol=1e-6)

    gap = shard_map(partial(global_avg_pool_spatial, axis_name=SPATIAL_AXIS),
                    mesh=mesh, in_specs=P(None, SPATIAL_AXIS),
                    out_specs=P())
    np.testing.assert_allclose(np.asarray(gap(x)),
                               np.asarray(global_avg_pool(x)),
                               rtol=1e-5, atol=1e-6)


def test_conv_chain_with_pool(mesh):
    """Two halo convs with a pool between — the composition the encoder
    uses — must match the unsharded chain."""
    n = mesh.shape[SPATIAL_AXIS]
    x = _rand(7, 1, 8 * n, 8, 8, 2)
    w1 = _rand(8, 3, 3, 3, 2, 4) * 0.3
    w2 = _rand(9, 3, 3, 3, 4, 4) * 0.3

    def local_chain(xl, w1, w2):
        xl = conv3d_local(xl, w1)
        xl = max_pool3d_spatial(xl)
        return conv3d_local(xl, w2)

    fn = shard_map(local_chain, mesh=mesh,
                   in_specs=(P(None, SPATIAL_AXIS), P(), P()),
                   out_specs=P(None, SPATIAL_AXIS))
    got = fn(x, w1, w2)
    ref = conv3d(max_pool3d(conv3d(x, w1)), w2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


class TestSpatialModel:
    """The unchanged Flax PCRLv23d run depth-sharded end-to-end."""

    @pytest.fixture(scope="class")
    def setup(self, mesh):
        from pcrlv2_tpu.core.precision import PARITY_POLICY
        from pcrlv2_tpu.models import PCRLv23d

        model = PCRLv23d(policy=PARITY_POLICY)
        n = mesh.shape[SPATIAL_AXIS]
        x = jax.random.uniform(jax.random.key(0), (2, 8 * n, 16, 16, 1))
        v = jax.jit(lambda: model.init(jax.random.key(1), x[:1, :8],
                                       train=True))()
        return model, v, x

    def test_eval_mode_matches_unsharded(self, mesh, setup):
        from pcrlv2_tpu.parallel.spatial_model import spatial_apply

        model, v, x = setup
        ref = model.apply(v, x, train=False)
        got = spatial_apply(model, v, x, mesh, train=False)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                                   atol=1e-5)
        for i in range(3):
            np.testing.assert_allclose(np.asarray(got[2][i]),
                                       np.asarray(ref[2][i]), atol=1e-5)
            for j in range(2):  # pro, pre — replicated across shards
                np.testing.assert_allclose(np.asarray(got[1][i][j]),
                                           np.asarray(ref[1][i][j]),
                                           atol=1e-5)

    def test_train_mode_matches_unsharded(self, mesh, setup):
        """Cross-shard BatchNorm statistics (axis_name) make train-mode
        normalization identical to the full-volume stats."""
        from pcrlv2_tpu.parallel.spatial_model import spatial_apply

        model, v, x = setup
        ref, _ = model.apply(v, x, train=True, mutable=["batch_stats"])
        got = spatial_apply(model, v, x, mesh, train=True)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(got[2][0]),
                                   np.asarray(ref[2][0]), atol=1e-4)

    def test_output_stays_sharded(self, mesh, setup):
        from pcrlv2_tpu.parallel.spatial_model import (spatial_apply,
                                                       spatial_sharded_input)

        model, v, x = setup
        xs = spatial_sharded_input(x, mesh)
        out, feats, masks = jax.jit(
            lambda x: spatial_apply(model, v, x, mesh, train=False))(xs)
        assert out.sharding.spec[1] == SPATIAL_AXIS
        assert masks[0].sharding.spec[1] == SPATIAL_AXIS


def test_sharded_upsample_matches_resize(mesh):
    """The halo phase-stencil depth upsample equals jax.image.resize for
    the half-pixel linear convention, scales 2 and 4."""
    from functools import partial as _partial

    from pcrlv2_tpu.ops.resize import _upsample_linear_sharded, upsample_linear

    n = mesh.shape[SPATIAL_AXIS]
    x = jax.random.uniform(jax.random.key(3), (2, 4 * n, 6, 6, 3))
    for scale in (2, 4):
        fn = shard_map(
            _partial(_upsample_linear_sharded, scale=scale,
                     axis_name=SPATIAL_AXIS),
            mesh=mesh, in_specs=P(None, SPATIAL_AXIS),
            out_specs=P(None, SPATIAL_AXIS))
        got = fn(x)
        ref = upsample_linear(x, scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
