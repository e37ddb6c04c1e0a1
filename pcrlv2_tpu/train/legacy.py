"""MoCo-era helpers the reference defines but never calls — provided for
capability parity (SURVEY.md §2.1 C5 lists them as part of the surface).

Reference ``train_2d.py:23-41``:

* ``moment_update(model, model_ema, m)`` — EMA of parameters into a momentum
  encoder (``p_ema = m·p_ema + (1−m)·p``).  Here a pure function over
  parameter pytrees (the idiomatic JAX form of an in-place loop over
  ``model.parameters()``).
* ``get_shuffle_ids(bsz)`` — a random permutation and its inverse, used by
  MoCo-style shuffled-BN.  Keyed PRNG instead of torch's global generator.
* ``Normalize(p)`` — row-wise Lp normalization module; a function here.

None of these participate in the PCRLv2 objective (they are dead code
upstream too); they exist so a user porting MoCo-lineage experiments from
the reference finds the same toolbox.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def moment_update(params, ema_params, m: float):
    """``ema = m·ema + (1−m)·params`` over parameter pytrees
    (reference ``moment_update``, ``train_2d.py:23-27``)."""
    return jax.tree_util.tree_map(
        lambda e, p: m * e + (1.0 - m) * p, ema_params, params)


def get_shuffle_ids(key, bsz: int):
    """(forward_ids, backward_ids) random permutation + inverse
    (reference ``get_shuffle_ids``, ``train_2d.py:30-36``)."""
    forward = jax.random.permutation(key, bsz)
    backward = jnp.zeros((bsz,), jnp.int32).at[forward].set(
        jnp.arange(bsz, dtype=jnp.int32))
    return forward, backward


def normalize(x: jax.Array, p: float = 2.0, axis: int = 1,
              eps: float = 1e-12) -> jax.Array:
    """Row-wise Lp normalization (reference ``Normalize`` module,
    ``train_2d.py:39-41``: ``x / x.norm(p, dim)``)."""
    n = jnp.sum(jnp.abs(x) ** p, axis=axis, keepdims=True) ** (1.0 / p)
    return x / jnp.maximum(n, eps)
