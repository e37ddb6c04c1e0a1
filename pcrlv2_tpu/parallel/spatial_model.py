"""Run the UNCHANGED Flax ``PCRLv23d`` with the volume depth-sharded across
chips — for volumes (or batch×volume products) that exceed one device's HBM.

``spatial_apply`` shard_maps ``model.apply`` over the mesh's ``spatial``
axis with the :mod:`pcrlv2_tpu.parallel.context` scope active, which makes
the channels-last ops communicate exactly what their receptive fields need:

* 3³ convs — 1-plane halo exchange (``ppermute`` over ICI),
* GAP heads — ``pmean``,
* train-mode BatchNorm — cross-shard batch statistics (``axis_name``),
* mask upsampling — edge-clamped halo + per-phase 2-tap stencils,
* max-pool / k2s2 transpose-conv / 1³ convs — purely local.

Equivalence with the unsharded forward is exact to fp tolerance in both
eval and train mode (tested on the virtual CPU mesh).  The input's leading
spatial extent must divide by ``shards · 8`` (three 2× pools).
"""

from __future__ import annotations

from functools import partial

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pcrlv2_tpu.core.mesh import SPATIAL_AXIS
from pcrlv2_tpu.parallel.context import spatial_scope


def spatial_apply(model, variables, x, mesh: Mesh, *,
                  axis_name: str = SPATIAL_AXIS, local: bool = False,
                  train: bool = False):
    """Depth-sharded ``model.apply``: x (B, D, H, W, C) with D split over
    ``axis_name``.  Returns the same ``(out, middle_features, middle_masks)``
    contract — ``out``/masks depth-sharded, pro/pre features replicated.
    """
    n = mesh.shape[axis_name]
    assert x.shape[1] % (n * 8) == 0, (
        f"leading spatial extent {x.shape[1]} must divide by shards*8 = {n * 8}")

    def local_fn(xl):
        with spatial_scope(axis_name):
            if train:
                outs, upd = model.apply(variables, xl, local=local,
                                        train=True, mutable=["batch_stats"])
                return outs  # stats identical across shards; discarded here
            return model.apply(variables, xl, local=local, train=False)

    # output layout: out + masks carry the depth sharding, features don't
    out_specs = (
        P(None, axis_name),
        [(P(), P())] * 3,
        [] if local else [P(None, axis_name)] * 3,
    )
    fn = shard_map(local_fn, mesh=mesh, in_specs=(P(None, axis_name),),
                   out_specs=out_specs, check_vma=False)
    return fn(x)


def spatial_sharded_input(x, mesh: Mesh, axis_name: str = SPATIAL_AXIS):
    """device_put ``x`` with dim 1 sharded over the spatial axis."""
    from jax.sharding import NamedSharding

    return jax.device_put(x, NamedSharding(mesh, P(None, axis_name)))
