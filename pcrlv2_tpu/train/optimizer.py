"""SGD + momentum + weight decay and the cosine LR schedule, with torch-SGD
update semantics.

Reference optimizer: ``torch.optim.SGD(lr, momentum=0.9, weight_decay=1e-4)``
(``train_3d.py:48-51``), cosine LR applied **per epoch**:
``lr·0.5·(1+cos(π·epoch/epochs))`` (``utils.py:101-114``).

torch SGD update (momentum m, weight decay wd):
    g ← grad + wd·p;  buf ← m·buf + g;  p ← p − lr·buf
which is exactly ``optax.add_decayed_weights(wd)`` → ``optax.trace(decay=m)``
with the learning rate applied afterwards.  The LR is injected per-step (a
traced scalar) so the jitted train step never recompiles across epochs.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def sgd(momentum: float = 0.9, weight_decay: float = 1e-4) -> optax.GradientTransformation:
    """Torch-semantics SGD core; produces *unscaled* momentum-buffer updates.

    The caller multiplies by ``-lr`` (see ``apply_lr``) so the per-epoch
    learning-rate schedule stays a traced input rather than baked into the
    optimizer.
    """
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
    )


def apply_lr(updates, lr):
    """Scale momentum-buffer updates into parameter deltas: ``-lr · buf``."""
    import jax

    return jax.tree_util.tree_map(lambda u: -lr * u, updates)


def cosine_lr(epoch, base_lr: float, total_epochs: int):
    """Per-epoch cosine schedule (reference ``utils.py:111-112``)."""
    total = max(int(total_epochs), 1)  # --epochs 0 smoke runs
    return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / total))
