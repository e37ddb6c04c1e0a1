"""Spatial (volume-depth) sharding — halo-exchanged 3D ops under shard_map.

The reference's only parallelism is data-parallel ``nn.DataParallel``
(``train_3d.py:54``); volumes that exceed one device's memory have no story
there.  This module is the TPU-native answer (the CP/SP analog for 3D CNNs,
SURVEY.md §2.3/§5): the volume's leading spatial axis (X in the (B, X, Y, Z,
C) layout) is sharded over the mesh's ``spatial`` axis, and each op
communicates exactly what its receptive field requires:

* 3³ conv — exchange one boundary plane with each neighbor (``ppermute``
  rides ICI), then convolve locally with VALID depth padding.  Global SAME
  semantics are restored by zeroing the wraparound halo at the volume ends.
* 2³/s2 max-pool, k2s2 transpose-conv, nearest/linear ×2 upsample — local
  when the per-shard extent is even (true for all power-of-two extents the
  models use), so those need no communication at all.
* global-average-pool heads — one ``pmean`` over the spatial axis.

All functions take *local* shards inside an enclosing ``shard_map``;
``conv3d_spatial`` is the standalone entry that wraps itself.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from pcrlv2_tpu.core.mesh import SPATIAL_AXIS


def halo_exchange(xl: jax.Array, axis_name: str, halo: int = 1,
                  boundary: str = "zero") -> jax.Array:
    """Append ``halo`` boundary planes from each neighbor along dim 1.

    Local shard (B, Dl, H, W, C) → (B, Dl + 2·halo, H, W, C).  The halo that
    would wrap around the volume ends is replaced per ``boundary``:
    ``"zero"`` (SAME zero-pad conv semantics) or ``"edge"`` (clamp — the
    convention of linear interpolation at the volume ends).
    """
    n = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    # plane(s) arriving from the left neighbor / right neighbor
    from_left = lax.ppermute(xl[:, -halo:], axis_name, fwd)
    from_right = lax.ppermute(xl[:, :halo], axis_name, bwd)
    if boundary == "edge":
        left_fill = jnp.broadcast_to(xl[:, :1], from_left.shape)
        right_fill = jnp.broadcast_to(xl[:, -1:], from_right.shape)
    else:
        left_fill = jnp.zeros_like(from_left)
        right_fill = jnp.zeros_like(from_right)
    from_left = jnp.where(idx == 0, left_fill, from_left)
    from_right = jnp.where(idx == n - 1, right_fill, from_right)
    return jnp.concatenate([from_left, xl, from_right], axis=1)


def conv3d_local(xl, w, b=None, *, axis_name: str = SPATIAL_AXIS):
    """SAME 3³ conv on a depth-sharded local block (inside shard_map)."""
    xh = halo_exchange(xl, axis_name, halo=1)
    out = lax.conv_general_dilated(
        xh, w.astype(xl.dtype), (1, 1, 1),
        [(0, 0), (1, 1), (1, 1)],   # depth covered by the halo; H/W SAME
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def max_pool3d_spatial(xl):
    """2³ stride-2 max-pool — purely local for even per-shard extents."""
    assert xl.shape[1] % 2 == 0, "per-shard depth must be even to pool locally"
    return lax.reduce_window(
        xl, -jnp.inf, lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID")


def global_avg_pool_spatial(xl, *, axis_name: str = SPATIAL_AXIS):
    """GAP over the full volume: local mean + pmean over the spatial axis
    (equal shard sizes make the two-stage mean exact)."""
    local = jnp.mean(xl, axis=(1, 2, 3))
    return lax.pmean(local, axis_name)


def conv3d_spatial(x, w, b, mesh: Mesh, *, axis_name: str = SPATIAL_AXIS):
    """Standalone depth-sharded SAME 3³ conv: shards ``x`` dim 1 over
    ``axis_name``, halo-exchanges one plane, convolves locally.

    Exactly equals the unsharded ``ops.conv3d`` (tested on a virtual mesh).
    """
    fn = shard_map(
        partial(conv3d_local, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(None, axis_name), P(), P()),
        out_specs=P(None, axis_name),
    )
    return fn(x, w, b)
