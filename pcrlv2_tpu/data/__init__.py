"""Data subsystem: manifests, on-device augmentation, host→HBM pipeline."""

from pcrlv2_tpu.data.manifests import (  # noqa: F401
    get_chest_list,
    get_luna_pretrain_list,
    get_luna_finetune_list,
    get_luna_list,
)
from pcrlv2_tpu.data.augment3d import make_luna_aug_fn  # noqa: F401
from pcrlv2_tpu.data.augment2d import make_chest_aug_fn  # noqa: F401
