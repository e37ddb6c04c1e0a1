"""Spatial-sharding context: which mesh axis (if any) the volume's leading
spatial dim is sharded over.

Set by :func:`pcrlv2_tpu.parallel.spatial_model.spatial_apply` around the
model's trace; the channels-last ops consult it so the SAME Flax model
definition runs unsharded or depth-sharded without code changes — convs halo
-exchange, GAP/BN reduce across shards, upsampling phase-shifts at shard
boundaries.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

_SPATIAL_AXIS: contextvars.ContextVar[Optional[str]] = contextvars.ContextVar(
    "pcrl_spatial_axis", default=None)


def current_spatial_axis() -> Optional[str]:
    """The mesh axis the leading spatial dim is sharded over, or None."""
    return _SPATIAL_AXIS.get()


@contextlib.contextmanager
def spatial_scope(axis_name: str):
    token = _SPATIAL_AXIS.set(axis_name)
    try:
        yield
    finally:
        _SPATIAL_AXIS.reset(token)
