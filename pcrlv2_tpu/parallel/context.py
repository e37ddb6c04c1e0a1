"""Sharding context: which mesh axes the current model trace is sharded over.

Set by :func:`pcrlv2_tpu.parallel.spatial_model.spatial_apply` and the
spatial train step around the model's trace; the channels-last ops consult it
so the SAME Flax model definition runs unsharded or sharded without code
changes:

* ``spatial`` axis — the volume's leading spatial dim is depth-sharded:
  convs halo-exchange, GAP pmeans, upsampling phase-shifts at shard
  boundaries, BatchNorm feature-map statistics reduce across shards.
* ``batch`` axes — the batch dim is sharded under ``shard_map`` (where XLA
  no longer sees the global batch): BatchNorm statistics additionally reduce
  over these axes so train-mode normalization matches the global-batch jit
  path exactly.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional, Tuple

_SPATIAL_AXIS: contextvars.ContextVar[Optional[str]] = contextvars.ContextVar(
    "pcrl_spatial_axis", default=None)
_BATCH_AXES: contextvars.ContextVar[Tuple[str, ...]] = contextvars.ContextVar(
    "pcrl_batch_axes", default=())


def current_spatial_axis() -> Optional[str]:
    """The mesh axis the leading spatial dim is sharded over, or None."""
    return _SPATIAL_AXIS.get()


def current_batch_axes() -> Tuple[str, ...]:
    """Mesh axes the batch dim is sharded over inside a shard_map, if any."""
    return _BATCH_AXES.get()


def current_stat_axes() -> Optional[Tuple[str, ...]]:
    """Axes BatchNorm statistics must reduce over (spatial + batch), for
    ``flax.linen.BatchNorm(axis_name=...)`` — None when unsharded."""
    axes = ()
    sp = _SPATIAL_AXIS.get()
    if sp is not None:
        axes = axes + (sp,)
    axes = axes + _BATCH_AXES.get()
    return axes or None


@contextlib.contextmanager
def spatial_scope(axis_name: Optional[str], batch_axes: Tuple[str, ...] = ()):
    """Activate sharded-model tracing: ``axis_name`` is the spatial axis (or
    None for batch-only sharding), ``batch_axes`` the shard_map axes carrying
    the batch dimension."""
    token_s = _SPATIAL_AXIS.set(axis_name)
    token_b = _BATCH_AXES.set(tuple(batch_axes))
    try:
        yield
    finally:
        _SPATIAL_AXIS.reset(token_s)
        _BATCH_AXES.reset(token_b)
