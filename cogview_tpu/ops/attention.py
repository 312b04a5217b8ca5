"""Dense attention with the reference's exact masking semantics.

Reference math (mpu/sparse_transformer.py:652-673): scores are
``(Q/sqrt(d)) @ K^T`` and masking is ``scores*mask - 10000*(1-mask)`` with
a binary mask — i.e. masked logits are exactly -10000, not -inf.  We
reproduce that with a ``where`` (bit-identical for binary masks, one fewer
HBM pass).  Scores and the softmax run in fp32 regardless of compute
dtype; the MXU contraction uses preferred_element_type=float32.

Layout is [B, S, N, D] ("BSND") — XLA fuses the head transpose into the
einsum, and this keeps the hidden dim contiguous for the surrounding
projections.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .hash_prng import hash_dropout
from .precision import dot_precision

MASK_VALUE = -10000.0


def dense_attention(
    q: jax.Array,  # [B, Sq, N, D]
    k: jax.Array,  # [B, Sk, N, D]
    v: jax.Array,  # [B, Sk, N, D]
    mask: jax.Array,  # broadcastable to [B, N, Sq, Sk], bool or 0/1
    *,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,  # uint32 (ops/hash_prng.py)
    train: bool = False,
) -> jax.Array:
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    scores = jnp.einsum(
        "bqnd,bknd->bnqk",
        (q * scale).astype(q.dtype),
        k,
        preferred_element_type=jnp.float32,
        precision=dot_precision(q, k),
    )
    mask_b = mask.astype(bool)
    scores = jnp.where(mask_b, scores, MASK_VALUE)
    probs = jax.nn.softmax(scores, axis=-1)
    if train and dropout_rate > 0.0 and dropout_seed is not None:
        # counter-hash dropout: jax.random draws inside scanned layer
        # bodies stall minutes on first execution (ops/hash_prng.py)
        probs = hash_dropout(probs, dropout_rate, dropout_seed, salt=1)
    probs = probs.astype(v.dtype)
    return jnp.einsum(
        "bnqk,bknd->bqnd", probs, v,
        preferred_element_type=jnp.float32, precision=dot_precision(probs, v),
    ).astype(v.dtype)


def dense_attention_kvT(
    q: jax.Array,  # [B, Sq, N, D]
    kT: jax.Array,  # [B, N, D, T]  (transposed cache layout)
    vT: jax.Array,  # [B, N, D, T]
    mask: jax.Array,  # broadcastable to [B, N, Sq, T]
) -> jax.Array:
    """Decode attention over the transposed KV cache.

    The cache stores K/V as [L,B,H,T] because XLA's layout assignment for
    the in-loop score/value matmuls prefers the contracted dims minor;
    keeping the carry in that layout removes two whole-cache layout-change
    copies per decode step (measured: 2 x 2.6GB at batch 10)."""
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    scores = jnp.einsum(
        "bqnd,bndk->bnqk",
        (q * scale).astype(q.dtype),
        kT,
        preferred_element_type=jnp.float32,
        precision=dot_precision(q, kT),
    )
    scores = jnp.where(mask.astype(bool), scores, MASK_VALUE)
    probs = jax.nn.softmax(scores, axis=-1).astype(vT.dtype)
    return jnp.einsum(
        "bnqk,bndk->bqnd", probs, vT,
        preferred_element_type=jnp.float32, precision=dot_precision(probs, vT),
    ).astype(vT.dtype)


def causal_mask(sq: int, sk: Optional[int] = None, sep: int = 0) -> jax.Array:
    """[1, 1, sq, sk] prefix-LM mask (reference build_mask_matrix,
    sparse_transformer.py:482-489): causal over the trailing sq queries,
    with full (bidirectional) visibility of the first ``sep`` positions and
    of all memory (sk - sq leading keys)."""
    if sk is None:
        sk = sq
    qpos = jnp.arange(sq)[:, None] + (sk - sq)
    kpos = jnp.arange(sk)[None, :]
    m = kpos <= qpos
    m = m | (kpos < sep + (sk - sq))
    return m[None, None]


def decode_mask(q_positions: jax.Array, cache_len: int) -> jax.Array:
    """[B, 1, Q, T] mask for attention against a KV cache: key slot t is
    visible to the query at absolute position p iff t <= p (slots beyond
    the written length have positions > p, so this also masks them)."""
    kpos = jnp.arange(cache_len)[None, None, None, :]
    return kpos <= q_positions[:, None, :, None]
