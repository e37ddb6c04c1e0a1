"""Training engine: fused jitted step, losses, optimizer, trainer loop,
checkpointing."""

from pcrlv2_tpu.train.losses import (  # noqa: F401
    cosine_similarity,
    cos_loss,
    mse_loss,
    beta_schedule,
)
from pcrlv2_tpu.train.optimizer import sgd, cosine_lr  # noqa: F401
