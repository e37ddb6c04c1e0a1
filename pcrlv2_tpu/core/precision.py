"""Mixed-precision policy.

The reference uses apex AMP ``O1`` with CUDA loss scaling (reference
``train_2d.py:73-74``, ``train_3d.py:52-53``).  TPUs compute natively in
bfloat16 — same exponent range as float32 — so no loss scaling is needed:
parameters and optimizer state stay float32, matmul/conv compute runs in bf16
on the MXU, and reductions (batch-norm statistics, losses) accumulate in f32.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """What dtype each class of tensor uses.

    ``param_dtype``   — stored parameters / optimizer state.
    ``compute_dtype`` — conv/matmul inputs (MXU path).
    ``output_dtype``  — activations handed between layers.
    """

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.bfloat16

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_output(self, x):
        return jnp.asarray(x, self.output_dtype)


#: Production policy: bf16 compute on the MXU, f32 master weights.
DEFAULT_POLICY = Policy()

#: Full-f32 policy for parity tests against the PyTorch reference.
PARITY_POLICY = Policy(
    param_dtype=jnp.float32, compute_dtype=jnp.float32, output_dtype=jnp.float32
)
