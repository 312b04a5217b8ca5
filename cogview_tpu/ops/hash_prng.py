"""Counter-based hash PRNG for device-side loops.

Why not jax.random inside loops: threefry's unrolled rotation chain is
minutes-slow per draw on this runtime (utils/rng.py), and the 'rbg'
RngBitGenerator instruction — while fast in steady state — costs a
one-time ~3 min first-execution stall when it appears inside a
``lax.fori_loop`` body on the axon TPU runtime (measured: a bare
100-iteration ``jax.random.bits`` loop = 189 s first run, 0.0 s after;
the same loop around softmax/argmax = 0.9 s).  Every random quantity a
device loop needs is therefore derived from a murmur-style integer hash
of its GLOBAL COORDINATES (step, row, position, ...) and one uint32 seed:
pure VPU integer arithmetic, bit-reproducible anywhere (TPU, CPU,
interpreter), identical between forward and backward passes, and free of
cross-step sequential state.

Users: the flash-attention in-kernel dropout mask (ops/flash_attention.py)
and the sampler's gumbel-max token draws (generation/sampling.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# distinct odd 32-bit multipliers per coordinate (golden-ratio family)
_C0 = 0x9E3779B1
_C1 = 0x85EBCA77
_C2 = 0xC2B2AE3D


def fmix32(x: jax.Array) -> jax.Array:
    """murmur3 finalizer variant (uint32 -> well-mixed uint32)."""
    x = x ^ lax.shift_right_logical(x, jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ lax.shift_right_logical(x, jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ lax.shift_right_logical(x, jnp.uint32(16))
    return x


def hash_u32(seed, c0, c1, c2) -> jax.Array:
    """Well-mixed uint32 from a seed and three (broadcastable) uint32
    coordinate arrays."""
    x = (jnp.asarray(c0, jnp.uint32) * jnp.uint32(_C0)
         + jnp.asarray(c1, jnp.uint32) * jnp.uint32(_C1)
         + jnp.asarray(c2, jnp.uint32) * jnp.uint32(_C2))
    return fmix32(x ^ jnp.asarray(seed, jnp.uint32))


def hash_uniform(seed, c0, c1, c2) -> jax.Array:
    """f32 uniform in the OPEN interval (0, 1) from hashed coordinates.

    The top-24-bit value (bits + 0.5) * 2^-24 lands exactly HALFWAY between
    the last two f32 values below 1.0 when bits == 2^24 - 1, and
    round-to-even takes it to 1.0 — through -log(-log(u)) that is +inf,
    which once per ~16M draws let a gumbel-max pick a -1e9-masked token
    (observed: ~1 invalid id per generated image).  Clamp to the largest
    f32 strictly below 1."""
    bits = lax.shift_right_logical(hash_u32(seed, c0, c1, c2), jnp.uint32(8))
    u = (bits.astype(jnp.float32) + 0.5) * jnp.float32(2.0 ** -24)
    return jnp.minimum(u, jnp.float32(1.0 - 2.0 ** -24))


def hash_dropout(x: jax.Array, rate: float, seed, salt: int = 0) -> jax.Array:
    """Inverted dropout with a counter-hash keep mask: element i of x is
    kept iff hash(seed, flat_index(i), salt) >= rate * 2^32.  Replaces
    jax.random.bernoulli inside scanned layer bodies (see module
    docstring for why).  ``salt`` separates call sites sharing a seed."""
    if rate <= 0.0:
        return x
    shape = x.shape
    assert len(shape) >= 2, "TPU iota needs >= 2D; dropout inputs are"
    flat = jnp.zeros(shape, jnp.uint32)
    for d, n in enumerate(shape):
        flat = flat * jnp.uint32(n) + lax.broadcasted_iota(jnp.uint32, shape, d)
    threshold = jnp.uint32(min(int(round(rate * 2.0 ** 32)), 2 ** 32 - 1))
    keep = hash_u32(seed, flat, jnp.uint32(salt), jnp.uint32(0)) >= threshold
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def seed_from_key(key: jax.Array) -> jax.Array:
    """uint32 seed from a PRNG key (typed or legacy raw) without any
    device-side bit-generator call."""
    if jax.dtypes.issubdtype(key.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(key)
    else:
        data = key
    data = jnp.asarray(data, jnp.uint32).reshape(-1)
    return (data[-1] ^ (data[0] << 1)).astype(jnp.uint32)
