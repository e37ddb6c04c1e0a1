"""PRNG key threading.

The reference parses ``--seed 42`` but never applies it (reference
``main.py:38``; there is no ``torch.manual_seed`` call), and runs with
``cudnn.benchmark=True`` (non-deterministic kernel selection).  Here every
source of randomness — augmentation, SimSiam level sampling, mixup — derives
from a single root key threaded per step, which is what makes fixed-seed
parity and distributed determinism possible.
"""

from __future__ import annotations

import jax


def step_key(seed: int, step, *extra_folds) -> jax.Array:
    """Deterministic per-step key: fold the step counter (+ extras) into seed."""
    key = jax.random.key(seed)
    key = jax.random.fold_in(key, step)
    for f in extra_folds:
        key = jax.random.fold_in(key, f)
    return key


def split_tree(key: jax.Array, tree):
    """Split ``key`` into one key per leaf of ``tree`` (same structure)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(treedef, list(keys))
