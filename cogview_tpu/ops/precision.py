"""Matmul precision policy.

JAX's DEFAULT dot precision computes float32 contractions in reduced
precision on TPU-class backends (~1e-2 relative error).  The framework's
hot path runs in bfloat16 where DEFAULT is already the native MXU mode,
but fp32 runs (parity tests, master-weight paths, logit/CE math) must be
true fp32.  Policy: HIGHEST iff every operand is float32.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def dot_precision(*operands) -> lax.Precision:
    if all(x.dtype == jnp.float32 for x in operands):
        return lax.Precision.HIGHEST
    return lax.Precision.DEFAULT
