"""LayerNorm with the reference's PB-relax semantics, TPU-native.

The reference LayerNorm (mpu/sparse_transformer.py:40-44) computes
``LN(x / (max|x|.detach() / 8))``.  LayerNorm is *almost* invariant under
positive input scaling — mean and std scale together — except through the
eps term:  LN_eps(x/c) == LN_{eps*c^2}(x) exactly.  We exploit that
identity: instead of materializing the divided tensor (an extra HBM pass),
we compute the global max (c = max|x|/8) and fold it into eps.  Bit-level
behavior matches the fp32 math of the reference prescale; at trained-model
activation scales the correction is O(eps/sigma^2) ~ 1e-9, but it is visible
with tiny random weights, so parity tests exercise it.

The global max is over the whole tensor (batch+seq+hidden), exactly as the
reference; under pjit sharding ``jnp.max`` lowers to an all-reduce-max.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def layer_norm(x, g, b, eps: float = 1e-5, pb_relax: bool = True):
    """x: [..., H]; g/b: [H].  Stats in fp32; output in x.dtype."""
    xf = x.astype(jnp.float32)
    if pb_relax:
        c = lax.stop_gradient(jnp.max(jnp.abs(xf))) / 8.0
        eps = eps * jnp.square(c)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y * g.astype(jnp.float32) + b.astype(jnp.float32)
    return y.astype(x.dtype)
