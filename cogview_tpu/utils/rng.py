"""PRNG key handling.

The default threefry PRNG generates random bits with a long unrolled
rotation chain that is catastrophically slow inside ``lax.fori_loop`` /
``lax.scan`` bodies on the TPU runtime this framework targets (measured:
8 categorical draws over a 58k vocab did not finish in minutes), and even
the 'rbg' implementation (XLA's native RngBitGenerator) costs a ~3 min
one-time first-execution stall when it appears inside a device loop.
Keys are therefore converted to rbg for *top-level* draws (pivot
sampling, init), while everything inside a device loop — sampler token
draws, per-layer dropout — derives its randomness from counter hashes of
one uint32 seed extracted from the key (ops/hash_prng.py).  Determinism
per seed is preserved end to end.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
import numpy as np


def rbg_key(seed_or_key: Union[int, jax.Array, None] = 0) -> jax.Array:
    """Make (or convert to) an 'rbg'-impl typed PRNG key.

    Accepts an int seed, a legacy uint32[2] PRNGKey, or any typed key.
    Conversion hashes the key data down to one uint32 seed, so distinct
    input keys map to distinct rbg streams.
    """
    if seed_or_key is None:
        seed_or_key = 0
    if isinstance(seed_or_key, (int, np.integer)):
        return jax.random.key(int(seed_or_key), impl="rbg")

    arr = seed_or_key
    if jax.dtypes.issubdtype(arr.dtype, jax.dtypes.prng_key):
        if "rbg" in str(jax.random.key_impl(arr)):
            return arr
        data = jax.random.key_data(arr)
    else:  # legacy raw key (uint32[...])
        data = arr
    data = jnp.asarray(data, jnp.uint32).reshape(-1)
    seed = (data[-1] ^ (data[0] << 1)).astype(jnp.uint32)
    return jax.random.key(seed, impl="rbg")
