"""Flash (blocked online-softmax) causal attention — Pallas TPU kernel.

XLA's dense attention materializes the [B,N,S,S] score tensor in HBM
(600MB/layer in fp32 at cogview scale, B8/N16/S1088); this kernel streams
K/V blocks through VMEM with the online-softmax recurrence so scores never
leave the chip, forward and backward.  Custom VJP implements the standard
two-pass flash backward (dq pass over q-blocks; dk/dv pass over k-blocks)
from saved (O, L=m+log l).

Masking preserves the reference semantics exactly: invalid logits are
-10000, not -inf (mpu/sparse_transformer.py:662-663), and the mask is
causal with an optional bidirectional prefix ``sep``
(build_mask_matrix, :482-489).

Attention-probability dropout (the reference's ``attention_dropout``,
sparse_transformer.py:672) runs *inside* the kernel: the keep mask for
score element (b, n, qpos, kpos) is a counter-based hash of its global
coordinates and a per-call seed, so it is independent of the block
partitioning, bit-reproducible between the forward and the two backward
passes, and costs a handful of VPU integer ops per element instead of a
[B,N,S,S] HBM mask tensor.  (pltpu.prng_random_bits is not used: the
Pallas interpreter stubs it out to zeros, and a hash of global coordinates
is what makes fwd/bwd agree without storing anything.)  The same hash is
exposed as ``dropout_keep_reference`` so tests can reproduce the exact
mask in a dense XLA computation.

Layout: [B, S, N, D]; wrapper pads S up to the q/k block size.  All
compute fp32 inside the kernel regardless of input dtype.

Measured on the target v5e chip (tutorial 12L/1024H/16N, dots-policy
remat, dropout 0.1, full train step, batch 16 at S=1089):

  r2 kernel (every block masked, bq=bk=128, fwd replayed in the remat
  backward): flash 32-34k tok/s vs XLA dense 38-42k — dense won ~18%.
  r3, after three changes, flash wins at the production length:
    + full/masked k-loop split (most blocks skip the iota/compare/select
      chain; the kernel is VPU-bound at D=64)        -> op-level win
    + checkpoint_name(o/lse) + policy saves them (the remat replay was
      re-running the whole fwd kernel per layer)      33.8k -> 38.1k
    + pad-aware large k-blocks (pick_flash_blocks;
      bk=576 at S=1089)                               38.1k -> 45.9k
  vs XLA dense 42.2k tok/s: flash is now +9% AND still the only path
  that fits S>=4k batches (dense [B,N,S,S] fp32 scores OOM at S=4096
  b8; flash runs it).

GPTConfig.use_flash_attention="auto" (default) picks flash iff
S >= flash_min_seq (1024), which follows this data.
"""

from __future__ import annotations

import functools
import math
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from .hash_prng import hash_u32, seed_from_key  # noqa: F401  (re-exported)

MASK_VALUE = -10000.0
DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128

# candidate k-block sizes for auto selection (all lane-friendly
# 128-multiples; larger blocks cut the per-block online-softmax
# bookkeeping — the kernel is VPU-bound at D=64)
_BLOCK_K_CANDIDATES = (704, 640, 576, 512, 448, 384, 320, 256, 192, 128)


def pick_flash_blocks(seq_len: int) -> tuple[int, int]:
    """(block_q, block_k) for a sequence length: block_q stays 128 (the
    measured winner — larger q-blocks add padded-row work faster than
    they amortize), block_k is the largest candidate whose padded length
    ceil(S/bk)*bk is minimal, so long k-loops shrink without paying pad
    FLOPs.  Measured (tutorial train step, S=1089 -> pad 1152, b16):
    bk=576 45.9k tok/s, bk=384 44.8k, bk=128 38.1k, XLA dense 42.2k."""
    padded = {bk: -(-seq_len // bk) * bk for bk in _BLOCK_K_CANDIDATES}
    best_pad = min(padded.values())
    bk = max(b for b, p in padded.items() if p == best_pad)
    return DEFAULT_BLOCK_Q, bk


def _causal_block_mask(qi, kb, bq, bk, sep, s_actual):
    """[bq, bk] bool for q-block qi, k-block kb."""
    qpos = qi * bq + lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    kpos = kb * bk + lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    visible = (kpos <= qpos) | (kpos < sep)
    in_range = (kpos < s_actual) & (qpos < s_actual)
    return visible & in_range


# --------------------------------------------------------------------- #
# in-kernel dropout: counter-based hash over global coordinates
# --------------------------------------------------------------------- #


def _hash_keep(qpos, kpos, bn, seed, threshold):
    """Keep mask from a hash of the element's global coordinates
    (ops/hash_prng.py).  qpos/kpos: uint32 arrays (broadcast-compatible);
    bn: uint32 scalar (b * num_heads + n); seed: uint32 scalar; threshold:
    uint32 scalar = round(rate * 2^32).  keep <=> hash >= threshold, so
    P(drop) = rate for a uniform hash."""
    return hash_u32(seed, qpos, kpos, bn) >= threshold


def _rate_threshold(rate: float) -> int:
    return min(int(round(rate * 2.0 ** 32)), 2 ** 32 - 1)


def dropout_keep_reference(seed, b, n, num_heads, sq, sk, rate):
    """[sq, sk] bool keep mask identical to the kernel's — for tests and
    for dense-XLA parity computations."""
    qpos = lax.broadcasted_iota(jnp.uint32, (sq, sk), 0)
    kpos = lax.broadcasted_iota(jnp.uint32, (sq, sk), 1)
    bn = jnp.uint32(b * num_heads + n)
    return _hash_keep(qpos, kpos, bn, jnp.uint32(seed),
                      jnp.uint32(_rate_threshold(rate)))


def _kernel_bn():
    """(b * N + n) for the current grid cell — must be evaluated at the
    kernel top level (the interpreter only substitutes program_id there,
    not inside fori_loop sub-jaxprs)."""
    return (pl.program_id(0) * pl.num_programs(1)
            + pl.program_id(1)).astype(jnp.uint32)


def _block_keep(seed_ref, bn, qi, kb, bq, bk, rate):
    """Keep mask for one (q-block, k-block) tile inside a kernel."""
    qpos = (qi.astype(jnp.uint32) * jnp.uint32(bq)
            + lax.broadcasted_iota(jnp.uint32, (bq, bk), 0))
    kpos = (kb.astype(jnp.uint32) * jnp.uint32(bk)
            + lax.broadcasted_iota(jnp.uint32, (bq, bk), 1))
    seed = seed_ref[0].astype(jnp.uint32)
    return _hash_keep(qpos, kpos, bn, seed,
                      jnp.uint32(_rate_threshold(rate)))


# --------------------------------------------------------------------- #
# forward
# --------------------------------------------------------------------- #


def _full_block_bounds(qi, bq, bk, sep, s_actual):
    """(nfull, last): k-blocks [0, nfull) need NO masking for q-block qi
    (every element visible: fully below the block's first row's diagonal,
    or fully inside the bidirectional prefix — and fully in range), while
    [nfull, last) need the element mask.  Splitting the k-loop this way
    removes the per-element iota/compare/select chain from the vast
    majority of blocks — the kernel is VPU-bound at D=64, so masked-path
    ops are the margin dense attention was winning by (its mask is a
    precomputed [1,1,S,S] broadcast read, amortized by XLA)."""
    f_causal = (qi * bq + 1 - bk) // bk + 1  # (kb+1)*bk-1 <= qi*bq
    f_sep = sep // bk  # fully inside the bidirectional prefix
    nfull = jnp.clip(jnp.maximum(f_causal, f_sep), 0, s_actual // bk)
    sep_blocks = -(-sep // bk)  # static cdiv
    nkb = -(-s_actual // bk)
    last = jnp.minimum(nkb, jnp.maximum((qi + 1) * bq // bk + 1, sep_blocks))
    return nfull, last


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, l_ref,
                *, bq, bk, sep, s_actual, scale, rate):
    qi = pl.program_id(2)
    bn = _kernel_bn()
    # dots run on the MXU in the INPUT dtype (bf16 in production) with f32
    # accumulation — an fp32xfp32 MXU dot costs ~4x the bf16 passes and was
    # measured to be why flash lost to XLA's (bf16) dense attention at
    # S=1089.  Softmax stays f32.
    q = q_ref[0, 0, :, :]  # [bq, D]

    m = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, q.shape[-1]), jnp.float32)

    def body(kb, carry, masked):
        m, l, acc = carry
        k = k_ref[0, 0, pl.ds(kb * bk, bk), :]  # [bk, D]
        v = v_ref[0, 0, pl.ds(kb * bk, bk), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        if masked:
            mask = _causal_block_mask(qi, kb, bq, bk, sep, s_actual)
            s = jnp.where(mask, s, MASK_VALUE)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        # l accumulates the raw softmax mass; dropout applies only to the
        # value-weighted accumulator, so acc/l == drop(softmax(s)) @ v
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if rate > 0.0:
            keep = _block_keep(seed_ref, bn, qi, kb, bq, bk, rate)
            p = jnp.where(keep, p / (1.0 - rate), 0.0)
        acc = acc * alpha + jnp.dot(p.astype(v.dtype), v,
                                    preferred_element_type=jnp.float32)
        return m_new, l, acc

    nfull, last = _full_block_bounds(qi, bq, bk, sep, s_actual)
    carry = lax.fori_loop(0, nfull,
                          functools.partial(body, masked=False), (m, l, acc))
    m, l, acc = lax.fori_loop(nfull, last,
                              functools.partial(body, masked=True), carry)
    o_ref[0, 0, :, :] = (acc / l).astype(o_ref.dtype)
    l_ref[0, 0, :, 0] = (m + jnp.log(l))[:, 0]


# --------------------------------------------------------------------- #
# backward
# --------------------------------------------------------------------- #


def _bwd_dq_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, *, bq, bk, sep, s_actual, scale, rate):
    qi = pl.program_id(2)
    bn = _kernel_bn()
    # dots in input dtype (bf16 in production) with f32 accumulation —
    # matches the precision of XLA's dense-attention backward
    q = q_ref[0, 0, :, :]
    do = do_ref[0, 0, :, :]
    lse = lse_ref[0, 0, :, :]  # [bq,1]
    delta = delta_ref[0, 0, :, :]

    dq = jnp.zeros((bq, q.shape[-1]), jnp.float32)

    def body(kb, dq, masked):
        k = k_ref[0, 0, pl.ds(kb * bk, bk), :]
        v = v_ref[0, 0, pl.ds(kb * bk, bk), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        if masked:
            mask = _causal_block_mask(qi, kb, bq, bk, sep, s_actual)
            s = jnp.where(mask, s, MASK_VALUE)
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        if rate > 0.0:
            keep = _block_keep(seed_ref, bn, qi, kb, bq, bk, rate)
            pd = jnp.where(keep, p / (1.0 - rate), 0.0)
        else:
            pd = p
        ds = (pd * dp - p * delta) * scale
        return dq + jnp.dot(ds.astype(k.dtype), k,
                            preferred_element_type=jnp.float32)

    nfull, last = _full_block_bounds(qi, bq, bk, sep, s_actual)
    dq = lax.fori_loop(0, nfull, functools.partial(body, masked=False), dq)
    dq = lax.fori_loop(nfull, last, functools.partial(body, masked=True), dq)
    dq_ref[0, 0, :, :] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, bq, bk, sep, s_actual, scale, rate):
    ki = pl.program_id(2)
    bn = _kernel_bn()
    k = k_ref[0, 0, :, :]  # [bk, D]
    v = v_ref[0, 0, :, :]
    sq_pad = q_ref.shape[2]
    nqb = sq_pad // bq

    dk = jnp.zeros(k.shape, jnp.float32)
    dv = jnp.zeros(v.shape, jnp.float32)

    def body(qb, carry, masked):
        dk, dv = carry
        q = q_ref[0, 0, pl.ds(qb * bq, bq), :]
        do = do_ref[0, 0, pl.ds(qb * bq, bq), :]
        lse = lse_ref[0, 0, pl.ds(qb * bq, bq), :]
        delta = delta_ref[0, 0, pl.ds(qb * bq, bq), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        if masked:
            mask = _causal_block_mask(qb, ki, bq, bk, sep, s_actual)
            s = jnp.where(mask, s, MASK_VALUE)
        p = jnp.exp(s - lse)
        if rate > 0.0:
            keep = _block_keep(seed_ref, bn, qb, ki, bq, bk, rate)
            pd = jnp.where(keep, p / (1.0 - rate), 0.0)
        else:
            pd = p
        dv = dv + jnp.dot(pd.astype(do.dtype).T, do,
                          preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = (pd * dp - p * delta) * scale
        dk = dk + jnp.dot(ds.astype(q.dtype).T, q,
                          preferred_element_type=jnp.float32)
        return dk, dv

    # q-blocks at or after this k-block's diagonal — unless this k-block
    # holds bidirectional-prefix keys (kpos < sep), visible to every
    # q-block.  The masked region is the LOW-qb side (diagonal); q-blocks
    # whose every row sees every key of this k-block ((ki+1)*bk-1 <=
    # qb*bq, or the whole k-block inside the prefix) run unmasked —
    # out-of-range q rows contribute exactly zero anyway (do = delta = 0
    # there), but out-of-range KEYS require the mask, so a k-block
    # touching s_actual stays fully masked.
    first = jnp.where(ki * bk < sep, 0, (ki * bk) // bq)
    qb_full = -(-((ki + 1) * bk - 1) // bq)
    full_start = jnp.where((ki + 1) * bk <= sep,
                           first, jnp.maximum(first, qb_full))
    full_start = jnp.where((ki + 1) * bk <= s_actual, full_start, nqb)
    dk, dv = lax.fori_loop(first, full_start,
                           functools.partial(body, masked=True), (dk, dv))
    dk, dv = lax.fori_loop(full_start, nqb,
                           functools.partial(body, masked=False), (dk, dv))
    dk_ref[0, 0, :, :] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0, :, :] = dv.astype(dv_ref.dtype)


# --------------------------------------------------------------------- #
# host-side wrappers
# --------------------------------------------------------------------- #


def _to_bnsd(x, block):
    """[B,S,N,D] -> padded [B,N,S,D] (TPU pallas wants (S,D) as the
    trailing block dims: last-two block sizes must be (div 8, div 128 or
    full))."""
    s = x.shape[1]
    pad = (-s) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
    return jnp.transpose(x, (0, 2, 1, 3))


def flash_attention(
    q: jax.Array,  # [B, S, N, D]
    k: jax.Array,
    v: jax.Array,
    sep: int = 0,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
    *,
    dropout_rate: float = 0.0,
    dropout_seed: jax.Array | int | None = None,
) -> jax.Array:
    """Flash attention with the reference's causal+sep mask and optional
    in-kernel attention-prob dropout.  ``dropout_seed`` may be a traced
    uint32 scalar (one draw per call; per-element bits come from the
    coordinate hash)."""
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    seed = jnp.asarray(
        0 if dropout_seed is None else dropout_seed
    ).astype(jnp.uint32).reshape((1,))
    return _flash_attention(q, k, v, seed, sep, block_q, block_k, interpret,
                            float(dropout_rate))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_attention(q, k, v, seed, sep, block_q, block_k, interpret, rate):
    o, _ = _flash_fwd_impl(q, k, v, seed, sep, block_q, block_k, interpret,
                           rate)
    return o


def _resolve_interpret(interpret):
    # pallas TPU kernels run interpreted on CPU hosts (tests, dry runs)
    if interpret:
        return True
    import jax as _jax

    return _jax.default_backend() == "cpu"


def _flash_fwd_impl(q, k, v, seed, sep, bq, bk, interpret, rate):
    interpret = _resolve_interpret(interpret)
    B, S, N, D = q.shape
    scale = 1.0 / math.sqrt(D)
    qp, kp, vp = _to_bnsd(q, bq), _to_bnsd(k, bk), _to_bnsd(v, bk)
    Sq, Sk = qp.shape[2], kp.shape[2]
    grid = (B, N, Sq // bq)

    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, bq=bq, bk=bk, sep=sep, s_actual=S,
                          scale=scale, rate=rate),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else _smem()),
            pl.BlockSpec((1, 1, bq, D), lambda b, n, qi: (b, n, qi, 0)),
            pl.BlockSpec((1, 1, Sk, D), lambda b, n, qi: (b, n, 0, 0)),
            pl.BlockSpec((1, 1, Sk, D), lambda b, n, qi: (b, n, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, n, qi: (b, n, qi, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, n, qi: (b, n, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(qp.shape, q.dtype),
            jax.ShapeDtypeStruct((B, N, Sq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(seed, qp, kp, vp)
    o = jnp.transpose(o, (0, 2, 1, 3))[:, :S]
    # Name the two forward products the backward needs as residuals: a
    # remat policy that saves these names (gpt._maybe_checkpoint extends
    # the dots policy with them) lets the checkpoint replay substitute the
    # saved values and dead-code the forward kernel out of the backward
    # pass entirely.  Measured (tutorial train step, b16, S=1089): without
    # this the policy-remat replay re-runs the fwd kernel and flash loses
    # to dense 33.8k vs 42.2k tok/s, despite winning every op-level
    # comparison; the names cost ~37MB/layer saved o+lse at b16.
    from jax.ad_checkpoint import checkpoint_name

    o = checkpoint_name(o, "flash_o")
    lse = checkpoint_name(lse, "flash_lse")
    return o, (q, k, v, seed, o, lse)


def _smem():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.SMEM


def _flash_fwd_rule(q, k, v, seed, sep, bq, bk, interpret, rate):
    o, res = _flash_fwd_impl(q, k, v, seed, sep, bq, bk, interpret, rate)
    return o, res


def _flash_bwd_rule(sep, bq, bk, interpret, rate, res, do):
    interpret = _resolve_interpret(interpret)
    q, k, v, seed, o, lse = res
    B, S, N, D = q.shape
    scale = 1.0 / math.sqrt(D)
    qp, kp, vp = _to_bnsd(q, bq), _to_bnsd(k, bk), _to_bnsd(v, bk)
    dop = _to_bnsd(do, bq)
    op = _to_bnsd(o, bq)
    Sq, Sk = qp.shape[2], kp.shape[2]

    # delta = rowsum(dO * O) — small, fp32, computed in XLA
    delta = jnp.sum(dop.astype(jnp.float32) * op.astype(jnp.float32), axis=-1,
                    keepdims=True)  # [B, N, Sq, 1]

    seed_spec = pl.BlockSpec(memory_space=pl.ANY if interpret else _smem())
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, bq=bq, bk=bk, sep=sep, s_actual=S,
                          scale=scale, rate=rate),
        grid=(B, N, Sq // bq),
        in_specs=[
            seed_spec,
            pl.BlockSpec((1, 1, bq, D), lambda b, n, qi: (b, n, qi, 0)),
            pl.BlockSpec((1, 1, Sk, D), lambda b, n, qi: (b, n, 0, 0)),
            pl.BlockSpec((1, 1, Sk, D), lambda b, n, qi: (b, n, 0, 0)),
            pl.BlockSpec((1, 1, bq, D), lambda b, n, qi: (b, n, qi, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, n, qi: (b, n, qi, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, n, qi: (b, n, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D), lambda b, n, qi: (b, n, qi, 0)),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        interpret=interpret,
    )(seed, qp, kp, vp, dop, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, bq=bq, bk=bk, sep=sep, s_actual=S,
                          scale=scale, rate=rate),
        grid=(B, N, Sk // bk),
        in_specs=[
            seed_spec,
            pl.BlockSpec((1, 1, Sq, D), lambda b, n, ki: (b, n, 0, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, n, ki: (b, n, ki, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, n, ki: (b, n, ki, 0)),
            pl.BlockSpec((1, 1, Sq, D), lambda b, n, ki: (b, n, 0, 0)),
            pl.BlockSpec((1, 1, Sq, 1), lambda b, n, ki: (b, n, 0, 0)),
            pl.BlockSpec((1, 1, Sq, 1), lambda b, n, ki: (b, n, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bk, D), lambda b, n, ki: (b, n, ki, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, n, ki: (b, n, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(kp.shape, k.dtype),
            jax.ShapeDtypeStruct(vp.shape, v.dtype),
        ],
        interpret=interpret,
    )(seed, qp, kp, vp, dop, lse, delta)

    tr = lambda x: jnp.transpose(x, (0, 2, 1, 3))[:, :S]
    return tr(dq), tr(dk), tr(dv), None


_flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)
