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
