"""Pivot + sliding-window sparse attention (training) — the reference's
long-context mechanism (mpu/sparse_transformer.py:675-750) rebuilt for TPU.

Each query attends jointly (one softmax) over:
  * a **pivot set** per sample — all text positions plus randomly sampled
    image positions (``num_pivot`` total) — masked to strictly-below the
    query's window band (``rmask``) so the two parts never double-count,
    with a ``+log(s/num_pivot)`` importance bias for the sampled density;
  * an **overlapping local window** — ``key_window_times`` x
    ``query_window`` trailing keys, causal within the band.

Layout is [B, S, N, D]; windows are built by left-padding and stacking
static slices (no as_strided — XLA fuses the slices), gathers ride
take_along_axis.  ``sparse_attention_inference`` covers the is_sparse=2
decode flavor: queries are the trailing block, keys are gathered at
pivot+window indices.

Bias-free mode (pivot_bias=0) is *exactly* equivalent to dense attention
under the union mask — the equivalence test the reference only printed
(sparse_transformer.py:753-821) is asserted in tests/test_sparse_attention.py.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .attention import MASK_VALUE
from .hash_prng import hash_dropout
from .precision import dot_precision


def chunk_windows(x: jax.Array, w: int, times: int) -> jax.Array:
    """[B,S,N,D] -> [B,G,times*w,N,D]; chunk g holds keys of global
    positions [g*w - (times-1)*w, (g+1)*w), zero-padded on the left."""
    B, S, N, D = x.shape
    assert S % w == 0, "seq_len must be divisible by query_window"
    G = S // w
    pad = jnp.pad(x, ((0, 0), ((times - 1) * w, 0), (0, 0), (0, 0)))
    return jnp.stack([pad[:, g * w : g * w + times * w] for g in range(G)], axis=1)


def window_mask(w: int, times: int, G: int) -> np.ndarray:
    """[G, w, times*w] bool: causal within the band + zero-pad exclusion."""
    T = times * w
    i = np.arange(w)[:, None]
    kk = np.arange(T)[None, :]
    causal = kk <= i + w * (times - 1)
    m = np.broadcast_to(causal, (G, w, T)).copy()
    for g in range(min(times - 1, G)):
        m[g, :, : (times - 1 - g) * w] = False
    return m


def build_rmask(s: int, w: int, times: int) -> np.ndarray:
    """[s, s] bool: True where a key is visible to the PIVOT part — the
    reference's recipe verbatim (sparse_transformer.py:491-496): the
    lower-triangle of the block-diagonal complement over the first
    s-(times-1)*w columns, shifted down by (times-1)*w rows."""
    inner = s - (times - 1) * w
    nb = s // w - times + 1
    blocks = np.zeros((inner, inner), bool)
    for i in range(nb):
        blocks[i * w : (i + 1) * w, i * w : (i + 1) * w] = True
    m = np.tril(~blocks)
    out = np.zeros((s, s), bool)
    out[(times - 1) * w :, :inner] = m
    return out


def pivot_window_attention(
    q: jax.Array,  # [B, S, N, D]
    k: jax.Array,
    v: jax.Array,
    pivot_idx: jax.Array,  # [B, P] int
    pivot_mask: jax.Array,  # [B, S, P] bool/0-1 (rmask gathered at pivots)
    query_window: int = 128,
    key_window_times: int = 6,
    pivot_bias: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,  # uint32 (ops/hash_prng.py)
    train: bool = False,
) -> jax.Array:
    B, S, N, D = q.shape
    P = pivot_idx.shape[1]
    w, times = query_window, key_window_times
    G = S // w
    T = times * w
    scale = 1.0 / math.sqrt(D)
    if pivot_bias is None:
        pivot_bias = math.log(S // P)

    qs = (q * scale).astype(q.dtype)

    # ---- pivot part ---------------------------------------------------- #
    gather = pivot_idx[:, :, None, None]
    pk = jnp.take_along_axis(k, gather, axis=1)  # [B,P,N,D]
    pv = jnp.take_along_axis(v, gather, axis=1)
    ps = jnp.einsum("bqnd,bpnd->bnqp", qs, pk,
                    preferred_element_type=jnp.float32,
                    precision=dot_precision(qs, pk))
    ps = jnp.where(pivot_mask.astype(bool)[:, None], ps, MASK_VALUE) + pivot_bias

    # ---- window part --------------------------------------------------- #
    wk = chunk_windows(k, w, times)  # [B,G,T,N,D]
    wv = chunk_windows(v, w, times)
    qw = qs.reshape(B, G, w, N, D)
    wsc = jnp.einsum("bgqnd,bgknd->bngqk", qw, wk,
                     preferred_element_type=jnp.float32,
                     precision=dot_precision(qw, wk))
    wm = jnp.asarray(window_mask(w, times, G))
    wsc = jnp.where(wm[None, None], wsc, MASK_VALUE)

    # ---- joint softmax -------------------------------------------------- #
    wsc_flat = wsc.reshape(B, N, S, T)
    joint = jnp.concatenate([ps, wsc_flat], axis=-1)
    probs = jax.nn.softmax(joint, axis=-1)
    if train and dropout_rate > 0.0 and dropout_seed is not None:
        # counter-hash dropout (ops/hash_prng.py) — no in-loop rbg draws
        probs = hash_dropout(probs, dropout_rate, dropout_seed, salt=1)
    probs = probs.astype(v.dtype)
    p_piv, p_win = probs[..., :P], probs[..., P:]

    out_piv = jnp.einsum("bnqp,bpnd->bqnd", p_piv, pv,
                         preferred_element_type=jnp.float32,
                         precision=dot_precision(p_piv, pv))
    p_win = p_win.reshape(B, N, G, w, T)
    out_win = jnp.einsum("bngqk,bgknd->bgqnd", p_win, wv,
                         preferred_element_type=jnp.float32,
                         precision=dot_precision(p_win, wv)).reshape(B, S, N, D)
    return (out_piv + out_win).astype(v.dtype)


def sparse_attention_inference(
    q: jax.Array,  # [B, Sq, N, D] — the trailing block of the sequence
    k: jax.Array,  # [B, Sk, N, D]
    v: jax.Array,
    pivot_and_window_idx: jax.Array,  # [B, P+W] (window idx = trailing keys)
) -> jax.Array:
    """is_sparse=2 decode (sparse_transformer.py:727-750): queries attend to
    gathered pivot+window keys; causal only within the trailing Sq block."""
    B, Sq, N, D = q.shape
    P = pivot_and_window_idx.shape[1]
    scale = 1.0 / math.sqrt(D)
    gather = pivot_and_window_idx[:, :, None, None]
    pk = jnp.take_along_axis(k, gather, axis=1)
    pv = jnp.take_along_axis(v, gather, axis=1)
    scores = jnp.einsum("bqnd,bpnd->bnqp", (q * scale).astype(q.dtype), pk,
                        preferred_element_type=jnp.float32,
                        precision=dot_precision(q, pk))
    if Sq > 1:
        i = jnp.arange(Sq)[:, None]
        j = jnp.arange(Sq)[None, :]
        tri = jnp.where(j > i, MASK_VALUE, 0.0)  # [Sq, Sq] on the tail keys
        scores = scores.at[..., :, P - Sq :].add(tri[None, None])
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bnqp,bpnd->bqnd", probs, pv,
                      preferred_element_type=jnp.float32,
                      precision=dot_precision(probs, pv))


def sample_pivots(
    rng: jax.Array,
    tokens: jax.Array,  # [B, S]
    num_pivot: int,
    img_vocab: int,
    loss_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Pivot sets: all text positions + uniformly sampled image positions
    (sparse_transformer.py:555-570), static-shape via priority top-k.

    Text positions get priority 2 (always selected), image positions a
    uniform (0,1) priority — the num_pivot highest priorities win.
    Requires #text <= num_pivot <= S.
    """
    B, S = tokens.shape
    is_txt = tokens >= img_vocab
    if loss_mask is not None:
        is_txt = is_txt & (loss_mask > 0)
    u = jax.random.uniform(rng, (B, S))
    priority = jnp.where(is_txt, 2.0, u)
    idx = lax.top_k(priority, num_pivot)[1]  # once per step, small S: fine
    return jnp.sort(idx, axis=-1).astype(jnp.int32)


def gather_pivot_mask(rmask: jax.Array, pivot_idx: jax.Array) -> jax.Array:
    """rmask [S,S] + pivot_idx [B,P] -> [B,S,P]."""
    return jax.vmap(lambda pi: rmask[:, pi])(pivot_idx)
