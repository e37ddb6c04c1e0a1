"""Core substrate: device mesh, precision policy, PRNG threading."""

from pcrlv2_tpu.core.mesh import (  # noqa: F401
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    local_device_count,
)
from pcrlv2_tpu.core.precision import Policy, DEFAULT_POLICY, PARITY_POLICY  # noqa: F401
from pcrlv2_tpu.core.rng import step_key, split_tree  # noqa: F401
