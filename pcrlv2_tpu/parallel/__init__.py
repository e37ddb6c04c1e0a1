"""Parallelism beyond data-parallel: spatial (volume-depth) sharding.

The reference has no model/sequence parallelism at all (SURVEY.md §2.3); the
closest analog of long-context scaling for this 3D-CNN workload is sharding
the volume's depth axis across chips with halo-exchanged convolutions.
"""

from pcrlv2_tpu.parallel.spatial import (  # noqa: F401
    conv3d_spatial,
    global_avg_pool_spatial,
    max_pool3d_spatial,
)
from pcrlv2_tpu.parallel.spatial_model import (  # noqa: F401
    spatial_apply,
    spatial_sharded_input,
)
from pcrlv2_tpu.parallel.spatial_train import (  # noqa: F401
    make_spatial_train_step,
    shard_views,
)
