"""Ring (context-parallel) attention over a sequence-sharded mesh axis.

Beyond-reference capability: the reference's only answer to long contexts
is the pivot+window sparse pattern (mpu/sparse_transformer.py:675-750) —
every GPU still holds the whole sequence.  Here the sequence itself
shards over a mesh axis: each device keeps its [B, S/c, N, D] slice of
Q/K/V, and K/V blocks rotate around the ring with `lax.ppermute` (one
ICI hop per step) while the online-softmax recurrence merges partial
attention — activation memory per chip drops by the ring size c, so
context length scales linearly with chips instead of being capped by one
chip's HBM.

Semantics match ``ops.attention.dense_attention`` with the reference's
causal+sep mask exactly: masked logits are -10000 (not -inf,
sparse_transformer.py:662-663), and attention-prob dropout uses the same
counter-hash keep mask over GLOBAL (b, n, q, k) coordinates as the dense
path's ``hash_dropout`` — the mask is partitioning-independent, so a
ring-sharded run reproduces the unsharded run bit-for-bit in expectation
and element-for-element in the keep pattern (tests assert equality).

The per-step body is wrapped in ``jax.checkpoint``: the [B, N, S/c, S/c]
score block never becomes a scan residual, so backward memory stays at
one block (recomputed per step), mirroring what the flash kernel's
custom VJP does within a chip.

Layout [B, S, N, D] as everywhere else; fp32 accumulation.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from .attention import MASK_VALUE
from .hash_prng import hash_u32
from .precision import dot_precision


def ring_attention(
    q: jax.Array,  # [B, Sc, N, D] — this shard's queries
    k: jax.Array,  # [B, Sc, N, D] — this shard's keys (ring start)
    v: jax.Array,  # [B, Sc, N, D]
    *,
    axis_name: str,
    n_shards: int,  # static ring size (mesh axis size)
    sep: int = 0,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
    train: bool = False,
    # when batch/heads are ALSO sharded in the enclosing shard_map, the
    # dropout hash needs GLOBAL (b, n) coordinates to stay partitioning-
    # independent; these name the axes and give the static head-shard count
    data_axis: Optional[str] = None,
    head_axis: Optional[str] = None,
    head_shards: int = 1,
) -> jax.Array:
    """Call INSIDE shard_map with the sequence dim sharded over
    ``axis_name``.  Returns this shard's [B, Sc, N, D] context."""
    B, Sc, N, D = q.shape
    c = n_shards
    sq = sk = c * Sc  # global sequence length
    n_global = N * head_shards
    b_off = (jnp.uint32(0) if data_axis is None
             else lax.axis_index(data_axis).astype(jnp.uint32) * jnp.uint32(B))
    n_off = (jnp.uint32(0) if head_axis is None
             else lax.axis_index(head_axis).astype(jnp.uint32) * jnp.uint32(N))
    i = lax.axis_index(axis_name)  # which query block this shard owns
    scale = 1.0 / math.sqrt(D)
    qs = (q * scale).astype(q.dtype)  # dense_attention's operand dtypes
    use_dropout = train and dropout_rate > 0.0 and dropout_seed is not None

    q_pos = i * Sc + lax.broadcasted_iota(jnp.int32, (Sc, Sc), 0)
    k_loc = lax.broadcasted_iota(jnp.int32, (Sc, Sc), 1)
    perm = [(r, (r + 1) % c) for r in range(c)]

    def step(carry, t):
        o, m, l, kb, vb = carry
        j = (i - t) % c  # id of the K/V block currently held
        s = jnp.einsum("bqnd,bknd->bnqk", qs, kb,
                       preferred_element_type=jnp.float32,
                       precision=dot_precision(qs, kb))
        k_pos = j * Sc + k_loc
        mask = (k_pos <= q_pos) | (k_pos < sep)  # causal + bidirectional sep
        s = jnp.where(mask[None, None], s, MASK_VALUE)
        m_j = jnp.max(s, axis=-1)  # [B, N, Sc]
        m_new = jnp.maximum(m, m_j)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l_new = l * alpha + jnp.sum(p, axis=-1)
        if use_dropout:
            ib = b_off + lax.broadcasted_iota(jnp.uint32, s.shape, 0)
            inh = n_off + lax.broadcasted_iota(jnp.uint32, s.shape, 1)
            qg = (i * Sc + lax.broadcasted_iota(jnp.int32, s.shape, 2)
                  ).astype(jnp.uint32)
            kg = (j * Sc + lax.broadcasted_iota(jnp.int32, s.shape, 3)
                  ).astype(jnp.uint32)
            flat = ((ib * jnp.uint32(n_global) + inh) * jnp.uint32(sq) + qg
                    ) * jnp.uint32(sk) + kg
            threshold = jnp.uint32(
                min(int(round(dropout_rate * 2.0 ** 32)), 2 ** 32 - 1))
            keep = hash_u32(dropout_seed, flat, jnp.uint32(1),
                            jnp.uint32(0)) >= threshold
            p_use = jnp.where(keep, p / (1.0 - dropout_rate),
                              jnp.zeros_like(p))
        else:
            p_use = p
        pd = p_use.astype(vb.dtype)  # dense casts probs to v.dtype pre-dot
        pv = jnp.einsum("bnqk,bknd->bnqd", pd, vb,
                        preferred_element_type=jnp.float32,
                        precision=dot_precision(pd, vb))
        o_new = o * alpha[..., None] + pv
        # rotate K/V one hop around the ring (last rotation is unused but
        # keeps the scan body uniform; one extra ICI hop out of c)
        kb2 = lax.ppermute(kb, axis_name, perm)
        vb2 = lax.ppermute(vb, axis_name, perm)
        return (o_new, m_new, l_new, kb2, vb2), None

    o0 = jnp.zeros((B, N, Sc, D), jnp.float32)
    m0 = jnp.full((B, N, Sc), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, N, Sc), jnp.float32)
    (o, m, l, _, _), _ = lax.scan(
        jax.checkpoint(step), (o0, m0, l0, k, v), jnp.arange(c))
    out = o / l[..., None]
    return jnp.transpose(out, (0, 2, 1, 3)).astype(v.dtype)


def ring_attention_sharded(
    q: jax.Array,  # [B, S, N, D] global (GSPMD-sharded) arrays
    k: jax.Array,
    v: jax.Array,
    *,
    seq_axis: str,
    n_shards: int,
    data_axis: Optional[str] = None,
    head_axis: Optional[str] = None,
    sep: int = 0,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
    train: bool = False,
) -> jax.Array:
    """shard_map wrapper for use under jit with an ambient mesh
    (jax.set_mesh): sequence over ``seq_axis``, optionally batch over
    ``data_axis`` and heads over ``head_axis`` (attention is batch- and
    head-local, so those axes need no collectives; only K/V blocks move,
    over ``seq_axis``)."""
    spec = P(data_axis, seq_axis, head_axis, None)
    mesh_shape = jax.sharding.get_abstract_mesh().shape
    assert mesh_shape.get(seq_axis) == n_shards, (
        f"n_shards={n_shards} != mesh axis {seq_axis!r} size "
        f"{mesh_shape.get(seq_axis)} — the ring would run the wrong "
        f"number of rotations")
    head_shards = 1
    if head_axis is not None:
        head_shards = mesh_shape[head_axis]
    fn = functools.partial(
        ring_attention, axis_name=seq_axis, n_shards=n_shards, sep=sep,
        dropout_rate=dropout_rate, train=train,
        data_axis=data_axis, head_axis=head_axis, head_shards=head_shards)

    def body(q_, k_, v_, seed_):
        return fn(q_, k_, v_,
                  dropout_seed=None if dropout_seed is None else seed_)

    seed = jnp.zeros((), jnp.uint32) if dropout_seed is None else (
        jnp.asarray(dropout_seed).astype(jnp.uint32))
    return jax.shard_map(
        body,
        in_specs=(spec, spec, spec, P()),
        out_specs=spec,
        check_vma=False,
    )(q, k, v, seed)
