"""Loss terms of the PCRLv2 objective.

The 4-term loss assembled by the reference trainers
(``train_3d.py:119-138``, ``train_2d.py:144-162``):

* ``loss1``      — pixel-restoration MSE between the model's sigmoid mask and
  the clean (spatially-augmented, uncorrupted) ground truth.
* ``loss2``      — SimSiam-style negative cosine between predictor output and
  the *stop-gradient* projection of the other view, at one randomly sampled
  decoder level (``cos_loss``, reference ``train_3d.py:86-92``).
* ``local_loss`` — the same cosine loss between each of the 6 local views and
  both global views, averaged over 12 terms.
* ``loss4``      — β-decayed MSE between the deep-supervision mask at the
  sampled level and the ground truth, β = ½(1+cos(πe/240))
  (reference ``train_3d.py:136-137``; the 240 is hard-coded upstream).

All randomness (level sampling) comes from threaded PRNG keys so the step
stays jittable and reproducible — the reference uses Python ``random.randint``
(``train_3d.py:87``) which is neither.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def cosine_similarity(a: jax.Array, b: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Row-wise cosine similarity, torch ``nn.CosineSimilarity(dim=1)`` semantics
    (denominator clamped at ``eps``)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    dot = jnp.sum(a * b, axis=1)
    na = jnp.linalg.norm(a, axis=1)
    nb = jnp.linalg.norm(b, axis=1)
    return dot / jnp.maximum(na * nb, eps)


def _pair_loss(pair1, pair2) -> jax.Array:
    """-½·[cos(pre₁, sg(pro₂)) + cos(pre₂, sg(pro₁))], means over batch."""
    pro1, pre1 = pair1
    pro2, pre2 = pair2
    l1 = cosine_similarity(pre1, lax.stop_gradient(pro2)).mean()
    l2 = cosine_similarity(pre2, lax.stop_gradient(pro1)).mean()
    return -(l1 + l2) * 0.5


def cos_loss(
    key: jax.Array,
    outputs1: Sequence[Tuple[jax.Array, jax.Array]],
    outputs2: Sequence[Tuple[jax.Array, jax.Array]],
) -> Tuple[jax.Array, jax.Array]:
    """SimSiam cosine loss at one PRNG-sampled decoder level.

    ``outputs*`` are lists of ``(pro, pre)`` pairs (one per decoder level,
    different feature dims per level — hence ``lax.switch`` rather than a
    stacked gather).  Returns ``(loss, index)``; gradients flow only through
    the sampled level, matching the reference's dynamic graph behavior.
    """
    n = len(outputs1)
    index = jax.random.randint(key, (), 0, n)
    branches = [
        (lambda i=i: _pair_loss(outputs1[i], outputs2[i])) for i in range(n)
    ]
    loss = lax.switch(index, branches)
    return loss, index


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean-squared error in f32 (torch ``nn.MSELoss`` default reduction)."""
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(diff * diff)


def beta_schedule(epoch, period: float = 240.0) -> jax.Array:
    """β = ½(1 + cos(π·epoch/240)) (reference ``train_3d.py:136``)."""
    return 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / period))
