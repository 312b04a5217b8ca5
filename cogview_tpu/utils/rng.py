"""PRNG key handling for device-side loops.

The default threefry PRNG generates random bits with a long unrolled
rotation chain that is catastrophically slow inside ``lax.fori_loop`` /
``lax.scan`` bodies on the TPU runtime this framework targets (measured:
8 categorical draws over a 58k vocab did not finish in minutes, while the
'rbg' implementation — XLA's native RngBitGenerator instruction — does
1024 of them in 30 ms).  Every key that reaches a device-side loop
(sampler steps, per-layer dropout in the scan over layers) is therefore
converted to an rbg key.  Determinism per seed is preserved; rbg's split/
fold_in have weaker independence guarantees, which is acceptable for
sampling noise and dropout masks.
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
