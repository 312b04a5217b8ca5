"""Fused single-token decode attention over a quantized KV cache — Pallas.

The hot loop of image generation is a 1024-step autoregressive decode whose
per-step cost is pure HBM bandwidth: every step must stream the model
weights plus the whole KV cache.  Three design decisions push this to the
roofline on TPU (all three were measured as distinct multi-ms/step costs
at cogview-base scale on v5e before being fused):

* the cache is stored **int8** with per-(head, token) scales — half the
  bf16 bytes, so a 16-image batch streams the same cache bytes as an
  8-image bf16 batch;
* dequantize + QK^T + mask + softmax + scale + PV run in **one kernel**,
  upcasting int8 tiles in VMEM.  Left to XLA, the s8->f32 convert of the
  cache is materialized in HBM at batch >= 16 (measured: 269 us per layer
  per tensor — 26 ms/step of pure dequant traffic);
* the **cache update happens inside the kernel** through
  ``input_output_aliases``: each grid cell quantizes the current token's
  K/V column and writes back one 128-token window with that column
  replaced.  An XLA ``dynamic_update_slice`` of a single s8 column is a
  read-modify-write of every (sublane x lane) tile the column crosses
  (measured: 101 us per layer per tensor — 9.7 ms/step at batch 16); the
  in-kernel windowed write is a small async DMA hidden by the grid
  pipeline.  As a bonus the current token attends to its *exact* bf16
  K/V (it is quantized only for later steps).

Cache layout is [L, B, N, D, Tp] (Tp = T rounded up to the 128-token
write window; scales [L, B, N, Tp] f32).  Tp as the MINOR dim is
load-bearing: it is a 128-lane multiple, so the s8 tiles pack with zero
padding — a [.., Tp, D=64] layout pads 64 lanes to 128 and DOUBLES the
cache footprint (measured: 2.0x expansion plus giant per-iteration
compress/decompress copies on the loop carry).  Both kernel matmuls are
direct batched GEMMs over the head block with no in-kernel transposes;
the stacked L dim keeps the model's ``lax.scan``
over layers carrying one buffer, with the *current layer* selected by a
scalar-prefetch argument feeding the BlockSpec index_maps, i.e. the DMA
engine reads layer ``li``'s blocks straight from HBM (an XLA
dynamic-slice of a scan carry would be a whole-layer HBM copy).

Masking matches ops/attention.decode_mask: cached slot kpos is visible iff
kpos < index, the current token is always visible to itself, and invisible
logits are -10000 exactly (reference mpu/sparse_transformer.py:662-663 —
they underflow to probability 0 after the f32 max subtraction).

The grid is (B, N/head_block, Tp/128) with the **token-window dim
innermost**, and the cache BlockSpec maps window ``w`` to
``min(w, index // 128)``: every dead window past the live prefix resolves
to the same block index as its predecessor, so the Pallas pipeline elides
the DMA entirely (revisited blocks are not re-fetched).  Per decode step
the kernel therefore streams only ``ceil((index+1)/128)`` live windows of
cache instead of the full padded Tp — over a 1024-token decode with a
~65-token prefix that is ~5.5 of 9 windows on average, cutting the cache
bytes (the dominant term at large batch) by ~1.6x.  Attention accumulates
across window steps flash-style (running max / sum / context scratch in
VMEM); the final window step adds the current token's exact bf16
contribution, normalizes, writes the context, and performs the windowed
cache write-back — at that step the resident cache block IS the live
window containing ``index``.  One window block [hb, D, 128] of K or V at
full head count is ~320 KB int8: large enough DMA chunks to hit full HBM
bandwidth while VMEM stays within budget under double buffering.

Reference for the math being fused: generation-time ``is_sparse=0``
attention (mpu/sparse_transformer.py:130-141, standard_attention :652-673);
the KV cache itself replaces the reference's "mems" recompute.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -10000.0
WRITE_WINDOW = 128  # token window written back per grid cell (lane-aligned)


def pad_cache_len(max_len: int) -> int:
    """Cache T is allocated in WRITE_WINDOW multiples so the write-back
    window never crosses the array edge.  Padded slots are never visible
    (kpos < index masking)."""
    return -(-max_len // WRITE_WINDOW) * WRITE_WINDOW


def pick_head_block(num_heads: int, head_dim: int, max_len: int) -> int:
    """Largest divisor of num_heads keeping one int8 K/V block under a
    conservative per-buffer budget (~1.5MB; x2 tensors x2 pipeline buffers
    + scales ~= 7MB of VMEM).  Mosaic requires block dims divisible by the
    tile shape unless they equal the array dim, so only multiples of 8 —
    or the full head count — qualify.

    Since the windowed-streaming rewrite the kernels call this with
    ``max_len=WRITE_WINDOW`` (one 128-token window resident at a time), so
    at cogview-base scale (40 heads, D=64) the block is the full head
    count; the Tp-sized budget only governs legacy callers/tests."""
    budget = 1536 * 1024
    cands = [h for h in range(num_heads, 0, -1)
             if num_heads % h == 0 and (h == num_heads or h % 8 == 0)]
    for h in cands:
        if h * head_dim * max_len <= budget:
            return h
    return cands[-1]


def _decode_kernel(s_ref, q_ref, kc_ref, vc_ref, k_ref, v_ref, ks_ref, vs_ref,
                   o_ref, ko_ref, vo_ref, kso_ref, vso_ref,
                   acc_ref, m_ref, l_ref, *, scale):
    """One (batch row, head block, token window) grid cell.

    s_ref (SMEM): [layer, index]; q/kc/vc [1,hb,D]; k/v [1,1,hb,D,W] int8
    — ONE 128-token window of the cache, the BlockSpec index_map clamps
    dead windows to ``lastw = index // W`` so their DMAs are elided;
    ks/vs [1,1,hb,W] f32.  Outputs: o [1,hb,D] ctx; ko/vo [1,1,hb,D,W] and
    kso/vso [1,1,hb,W] — the write-back window containing slot ``index``
    (aliased onto the cache arrays).  acc/m/l: VMEM scratch carrying the
    flash-style running context / max / normalizer across window steps."""
    index = s_ref[1]
    w = pl.program_id(2)
    nw = pl.num_programs(2)
    lastw = index // WRITE_WINDOW
    q = q_ref[0].astype(jnp.float32) * scale  # [hb, D]
    hb, D = q.shape
    W = WRITE_WINDOW

    @pl.when(w == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(w <= lastw)
    def _accumulate():
        k = k_ref[0, 0].astype(jnp.float32)  # [hb, D, W]
        s = lax.dot_general(
            q[:, None, :], k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, 0, :]  # [hb, W]
        s = s * ks_ref[0, 0]
        kpos = w * W + lax.broadcasted_iota(jnp.int32, (hb, W), 1)
        s = jnp.where(kpos < index, s, MASK_VALUE)
        m_prev = m_ref[:, 0]  # [hb]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
        alpha = jnp.exp(m_prev - m_new)  # [hb]
        p = jnp.exp(s - m_new[:, None])  # [hb, W]
        l_ref[:, 0] = l_ref[:, 0] * alpha + jnp.sum(p, axis=1)
        pv = p * vs_ref[0, 0]
        v = v_ref[0, 0].astype(jnp.float32)  # [hb, D, W]
        ctx = lax.dot_general(
            pv[:, None, :], v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, 0, :]  # [hb, D]
        acc_ref[...] = acc_ref[...] * alpha[:, None] + ctx
        m_ref[:, 0] = m_new

    @pl.when(w == nw - 1)
    def _finalize():
        kc = kc_ref[0].astype(jnp.float32)  # [hb, D] current key column
        vc = vc_ref[0].astype(jnp.float32)

        # ---- current token attends to its exact bf16 column ----
        s_cur = jnp.sum(q * kc, axis=1)  # [hb]
        m_prev = m_ref[:, 0]
        m_fin = jnp.maximum(m_prev, s_cur)
        alpha = jnp.exp(m_prev - m_fin)
        p_cur = jnp.exp(s_cur - m_fin)
        l_fin = l_ref[:, 0] * alpha + p_cur
        ctx = (acc_ref[...] * alpha[:, None] + p_cur[:, None] * vc)
        o_ref[0] = (ctx / l_fin[:, None]).astype(o_ref.dtype)

        # ---- quantize the current column (for FUTURE steps' reads) ----
        # kept f32 until the windowed write: Mosaic only supports
        # minor-dim broadcasts for 32-bit types
        ks_new = jnp.maximum(jnp.max(jnp.abs(kc), axis=1), 1e-8) / 127.0
        vs_new = jnp.maximum(jnp.max(jnp.abs(vc), axis=1), 1e-8) / 127.0
        kq_new = jnp.round(kc / ks_new[:, None])  # [hb, D] in [-127, 127]
        vq_new = jnp.round(vc / vs_new[:, None])

        # ---- windowed cache write-back with the new column inserted ----
        # the resident k/v block at the final step is window
        # min(nw - 1, lastw) == lastw: exactly the window holding `index`
        col = index - lastw * W
        onehot = lax.broadcasted_iota(jnp.int32, (hb, W), 1) == col
        onehot3 = lax.broadcasted_iota(jnp.int32, (hb, D, W), 2) == col
        k_win = k_ref[0, 0].astype(jnp.float32)  # [hb, D, W]
        v_win = v_ref[0, 0].astype(jnp.float32)
        ko_ref[0, 0] = jnp.where(onehot3, kq_new[:, :, None], k_win).astype(jnp.int8)
        vo_ref[0, 0] = jnp.where(onehot3, vq_new[:, :, None], v_win).astype(jnp.int8)
        kso_ref[0, 0] = jnp.where(onehot, ks_new[:, None], ks_ref[0, 0])
        vso_ref[0, 0] = jnp.where(onehot, vs_new[:, None], vs_ref[0, 0])


def _shard_over_batch(fn, data_axis, model_axis, q, k_col, v_col, kq, vq,
                      ks, vs, layer_idx, index):
    """Run a quantized-decode kernel per mesh shard: batch dims sharded
    over ``data_axis`` (cache dim 1, columns dim 0), HEAD dims over
    ``model_axis`` (cache dim 2, columns dim 1), scalars replicated.
    Attention is (batch row, head)-local, so the kernel needs no
    cross-shard collectives either way.  Uses the ambient mesh
    (jax.set_mesh)."""
    P_ = jax.sharding.PartitionSpec
    col = P_(data_axis, model_axis)
    cache = P_(None, data_axis, model_axis)
    scl = P_(None, data_axis, model_axis)
    rep = P_()
    return jax.shard_map(
        fn,
        in_specs=(col, col, col, cache, cache, scl, scl, rep, rep),
        out_specs=(col, cache, cache, scl, scl),
        # pallas_call out_shapes carry no varying-mesh-axes metadata; the
        # kernel is per-shard pure so the vma check has nothing to verify
        check_vma=False,
    )(q, k_col, v_col, kq, vq, ks, vs, layer_idx, index)


def decode_attention_quant(
    q: jax.Array,  # [B, N, D] current token's queries (compute dtype)
    k_col: jax.Array,  # [B, N, D] current token's key (compute dtype)
    v_col: jax.Array,  # [B, N, D] current token's value
    k8: jax.Array,  # [L, B, N, D, Tp] int8 cache
    v8: jax.Array,  # [L, B, N, D, Tp] int8
    kscale: jax.Array,  # [L, B, N, Tp] f32
    vscale: jax.Array,  # [L, B, N, Tp] f32
    layer_idx: jax.Array,  # scalar int32
    index: jax.Array,  # scalar int32: current absolute position
    *,
    head_block: int | None = None,
    interpret: bool = False,
    data_axis: str | None = None,
    model_axis: str | None = None,
):
    """-> (ctx [B, N, D] in q.dtype, k8', v8', kscale', vscale').

    The cache arrays are donated (input_output_aliases); layer ``layer_idx``
    gets slot ``index`` updated with the quantized (k_col, v_col).  Falls
    back to interpret mode on CPU.  ``data_axis``/``model_axis`` run the
    kernel per shard of an ambient mesh — batch rows over data, heads over
    model (multi-chip DP/TP decode over the quantized cache; attention is
    (row, head)-local so no collectives)."""
    if data_axis is not None or model_axis is not None:
        fn = functools.partial(decode_attention_quant,
                               head_block=head_block, interpret=interpret)
        return _shard_over_batch(fn, data_axis, model_axis, q, k_col, v_col,
                                 k8, v8, kscale, vscale, layer_idx, index)
    B, N, D = q.shape
    L, _, _, _, Tp = k8.shape
    assert k8.shape == (L, B, N, D, Tp) and kscale.shape == (L, B, N, Tp)
    assert Tp % WRITE_WINDOW == 0, "allocate the cache via pad_cache_len"
    scale = 1.0 / math.sqrt(D)
    W = WRITE_WINDOW
    hb = head_block or pick_head_block(N, D, W)
    assert N % hb == 0
    if not interpret:
        interpret = jax.default_backend() == "cpu"

    nw = Tp // W
    scalars = jnp.stack([jnp.asarray(layer_idx, jnp.int32),
                         jnp.asarray(index, jnp.int32)])
    col_spec = pl.BlockSpec((1, hb, D), lambda b, h, w, s: (b, h, 0))
    # dead windows clamp to the last live window -> the pipeline sees an
    # unchanged block index and elides the fetch (live-window streaming)
    cache_spec = pl.BlockSpec(
        (1, 1, hb, D, W),
        lambda b, h, w, s: (s[0], b, h, 0, jnp.minimum(w, s[1] // W)))
    scale_spec = pl.BlockSpec(
        (1, 1, hb, W),
        lambda b, h, w, s: (s[0], b, h, jnp.minimum(w, s[1] // W)))
    win_spec = pl.BlockSpec(
        (1, 1, hb, D, W), lambda b, h, w, s: (s[0], b, h, 0, s[1] // W))
    swin_spec = pl.BlockSpec(
        (1, 1, hb, W), lambda b, h, w, s: (s[0], b, h, s[1] // W))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, N // hb, nw),
        in_specs=[col_spec, col_spec, col_spec,
                  cache_spec, cache_spec, scale_spec, scale_spec],
        out_specs=[col_spec, win_spec, win_spec, swin_spec, swin_spec],
        scratch_shapes=[pltpu.VMEM((hb, D), jnp.float32),
                        pltpu.VMEM((hb, 1), jnp.float32),
                        pltpu.VMEM((hb, 1), jnp.float32)],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((B, N, D), q.dtype),
        jax.ShapeDtypeStruct(k8.shape, jnp.int8),
        jax.ShapeDtypeStruct(v8.shape, jnp.int8),
        jax.ShapeDtypeStruct(kscale.shape, jnp.float32),
        jax.ShapeDtypeStruct(vscale.shape, jnp.float32),
    ]
    # tensor input i (after the scalar-prefetch arg) aliases output slot:
    # k8 -> 1, v8 -> 2, kscale -> 3, vscale -> 4
    aliases = {4: 1, 5: 2, 6: 3, 7: 4}
    ctx, k8, v8, kscale, vscale = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
    )(scalars, q, k_col, v_col, k8, v8, kscale, vscale)
    return ctx, k8, v8, kscale, vscale


# --------------------------------------------------------------------- #
# int4 variant (opt-in, cfg.kv_cache_dtype="int4")
# --------------------------------------------------------------------- #
#
# Packing: cache [L, B, N, D/2, Tp] int8 where byte (d2, t) holds TWO
# 4-bit values of the same (head, token) column: head-dim row d2 in the
# high nibble (signed, [-7, 7]) and row d2 + D/2 in the low nibble
# (stored biased +8, [1, 15]).  Unpacking is pure f32 VPU math —
# hi = floor(b / 16), lo = b - 16*hi - 8 — because Mosaic's integer-shift
# support on s8 vectors is unreliable while floor/mul/sub on f32 are
# native.  The QK^T and PV dots then run per D-half against the unpacked
# [hb, D/2, Tp] tensors (contraction over the sublane dim, like the int8
# kernel), so no nibble interleave/relayout is ever materialized; the two
# half-contexts concatenate on the small [hb, D/2] output.
#
# Accuracy: per-(head, token) absmax/7 scales — one sign bit + 3
# magnitude bits per element, ~16x the int8 rounding error.  Shipped as
# an OPT-IN serving mode (the int8 cache stays the default): with
# released weights absent from this environment the FID impact is not
# measurable here, so the default stays at the conservative setting.


def _unpack4(bf: jax.Array) -> tuple[jax.Array, jax.Array]:
    """f32 packed bytes -> (hi, lo) f32 nibble values in [-8, 7]."""
    hi = jnp.floor(bf * (1.0 / 16.0))
    lo = bf - 16.0 * hi - 8.0
    return hi, lo


def _decode_kernel4(s_ref, q_ref, kc_ref, vc_ref, k_ref, v_ref, ks_ref, vs_ref,
                    o_ref, ko_ref, vo_ref, kso_ref, vso_ref,
                    acc_ref, m_ref, l_ref, *, scale):
    """int4 flavor of _decode_kernel: same windowed-streaming grid with
    D/2 packed cache rows, unpacked per window in VMEM."""
    index = s_ref[1]
    w = pl.program_id(2)
    nw = pl.num_programs(2)
    lastw = index // WRITE_WINDOW
    q = q_ref[0].astype(jnp.float32) * scale  # [hb, D]
    hb, D = q.shape
    D2 = D // 2
    W = WRITE_WINDOW

    @pl.when(w == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(w <= lastw)
    def _accumulate():
        kf = k_ref[0, 0].astype(jnp.float32)  # [hb, D2, W] packed bytes
        k_hi, k_lo = _unpack4(kf)
        # lax.slice_in_dim, not q[:, :D2]: jnp fancy-slicing lowers to a
        # gather Mosaic has no rule for at these shapes
        q_hi = lax.slice_in_dim(q, 0, D2, axis=1)[:, None, :]  # [hb, 1, D2]
        q_lo = lax.slice_in_dim(q, D2, D, axis=1)[:, None, :]
        s = (
            lax.dot_general(q_hi, k_hi, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
            + lax.dot_general(q_lo, k_lo, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
        )[:, 0, :]  # [hb, W]
        s = s * ks_ref[0, 0]
        kpos = w * W + lax.broadcasted_iota(jnp.int32, (hb, W), 1)
        s = jnp.where(kpos < index, s, MASK_VALUE)
        m_prev = m_ref[:, 0]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_ref[:, 0] = l_ref[:, 0] * alpha + jnp.sum(p, axis=1)
        pv = p * vs_ref[0, 0]
        vf = v_ref[0, 0].astype(jnp.float32)
        v_hi, v_lo = _unpack4(vf)
        ctx_hi = lax.dot_general(pv[:, None, :], v_hi,
                                 (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)[:, 0, :]
        ctx_lo = lax.dot_general(pv[:, None, :], v_lo,
                                 (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)[:, 0, :]
        ctx = jnp.concatenate([ctx_hi, ctx_lo], axis=1)  # [hb, D]
        acc_ref[...] = acc_ref[...] * alpha[:, None] + ctx
        m_ref[:, 0] = m_new

    @pl.when(w == nw - 1)
    def _finalize():
        kc = kc_ref[0].astype(jnp.float32)
        vc = vc_ref[0].astype(jnp.float32)
        s_cur = jnp.sum(q * kc, axis=1)
        m_prev = m_ref[:, 0]
        m_fin = jnp.maximum(m_prev, s_cur)
        alpha = jnp.exp(m_prev - m_fin)
        p_cur = jnp.exp(s_cur - m_fin)
        l_fin = l_ref[:, 0] * alpha + p_cur
        ctx = acc_ref[...] * alpha[:, None] + p_cur[:, None] * vc
        o_ref[0] = (ctx / l_fin[:, None]).astype(o_ref.dtype)

        # ---- quantize + pack the current column ----
        ks_new = jnp.maximum(jnp.max(jnp.abs(kc), axis=1), 1e-8) / 7.0
        vs_new = jnp.maximum(jnp.max(jnp.abs(vc), axis=1), 1e-8) / 7.0
        kq = jnp.clip(jnp.round(kc / ks_new[:, None]), -7.0, 7.0)  # [hb, D]
        vq = jnp.clip(jnp.round(vc / vs_new[:, None]), -7.0, 7.0)

        def _pack(x):  # [hb, D] -> [hb, D2]; lax slices (gather-free)
            hi = lax.slice_in_dim(x, 0, D2, axis=1)
            lo = lax.slice_in_dim(x, D2, D, axis=1)
            return 16.0 * hi + (lo + 8.0)

        # ---- windowed write-back (resident block == window lastw) ----
        col = index - lastw * W
        onehot = lax.broadcasted_iota(jnp.int32, (hb, W), 1) == col
        onehot3 = lax.broadcasted_iota(jnp.int32, (hb, D2, W), 2) == col
        k_win = k_ref[0, 0].astype(jnp.float32)
        v_win = v_ref[0, 0].astype(jnp.float32)
        ko_ref[0, 0] = jnp.where(onehot3, _pack(kq)[:, :, None], k_win).astype(jnp.int8)
        vo_ref[0, 0] = jnp.where(onehot3, _pack(vq)[:, :, None], v_win).astype(jnp.int8)
        kso_ref[0, 0] = jnp.where(onehot, ks_new[:, None], ks_ref[0, 0])
        vso_ref[0, 0] = jnp.where(onehot, vs_new[:, None], vs_ref[0, 0])


def decode_attention_quant4(
    q: jax.Array,  # [B, N, D]
    k_col: jax.Array,
    v_col: jax.Array,
    k4: jax.Array,  # [L, B, N, D/2, Tp] int8 (packed nibbles)
    v4: jax.Array,
    kscale: jax.Array,  # [L, B, N, Tp] f32
    vscale: jax.Array,
    layer_idx: jax.Array,
    index: jax.Array,
    *,
    head_block: int | None = None,
    interpret: bool = False,
    data_axis: str | None = None,
    model_axis: str | None = None,
):
    """int4 counterpart of decode_attention_quant (see packing note above)."""
    if data_axis is not None or model_axis is not None:
        fn = functools.partial(decode_attention_quant4,
                               head_block=head_block, interpret=interpret)
        return _shard_over_batch(fn, data_axis, model_axis, q, k_col, v_col,
                                 k4, v4, kscale, vscale, layer_idx, index)
    B, N, D = q.shape
    L, _, _, D2, Tp = k4.shape
    assert D2 == D // 2 and kscale.shape == (L, B, N, Tp)
    assert Tp % WRITE_WINDOW == 0
    scale = 1.0 / math.sqrt(D)
    W = WRITE_WINDOW
    # budget on the UNPACKED f32 footprint, not the packed bytes: each
    # packed byte becomes two f32 lanes (8x), so size the head block as if
    # elements were 2*D wide (per resident 128-token window)
    hb = head_block or pick_head_block(N, 2 * D, W)
    assert N % hb == 0
    if not interpret:
        interpret = jax.default_backend() == "cpu"

    nw = Tp // W
    scalars = jnp.stack([jnp.asarray(layer_idx, jnp.int32),
                         jnp.asarray(index, jnp.int32)])
    col_spec = pl.BlockSpec((1, hb, D), lambda b, h, w, s: (b, h, 0))
    cache_spec = pl.BlockSpec(
        (1, 1, hb, D2, W),
        lambda b, h, w, s: (s[0], b, h, 0, jnp.minimum(w, s[1] // W)))
    scale_spec = pl.BlockSpec(
        (1, 1, hb, W),
        lambda b, h, w, s: (s[0], b, h, jnp.minimum(w, s[1] // W)))
    win_spec = pl.BlockSpec(
        (1, 1, hb, D2, W), lambda b, h, w, s: (s[0], b, h, 0, s[1] // W))
    swin_spec = pl.BlockSpec(
        (1, 1, hb, W), lambda b, h, w, s: (s[0], b, h, s[1] // W))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, N // hb, nw),
        in_specs=[col_spec, col_spec, col_spec,
                  cache_spec, cache_spec, scale_spec, scale_spec],
        out_specs=[col_spec, win_spec, win_spec, swin_spec, swin_spec],
        scratch_shapes=[pltpu.VMEM((hb, D), jnp.float32),
                        pltpu.VMEM((hb, 1), jnp.float32),
                        pltpu.VMEM((hb, 1), jnp.float32)],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((B, N, D), q.dtype),
        jax.ShapeDtypeStruct(k4.shape, jnp.int8),
        jax.ShapeDtypeStruct(v4.shape, jnp.int8),
        jax.ShapeDtypeStruct(kscale.shape, jnp.float32),
        jax.ShapeDtypeStruct(vscale.shape, jnp.float32),
    ]
    aliases = {4: 1, 5: 2, 6: 3, 7: 4}
    ctx, k4, v4, kscale, vscale = pl.pallas_call(
        functools.partial(_decode_kernel4, scale=scale),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
    )(scalars, q, k_col, v_col, k4, v4, kscale, vscale)
    return ctx, k4, v4, kscale, vscale


def quantize_kv4(cols: jax.Array, num_heads: int) -> tuple[jax.Array, jax.Array]:
    """Per-(head, token) absmax int4 quantization + nibble packing
    (prefill path).  cols [B, H, S] -> (packed int8 [B, N, D/2, S],
    scales f32 [B, N, S])."""
    B, H, S = cols.shape
    D = H // num_heads
    c = cols.reshape(B, num_heads, D, S).astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(c), axis=2), 1e-8) / 7.0
    qv = jnp.clip(jnp.round(c / s[:, :, None, :]), -7.0, 7.0)
    D2 = D // 2
    packed = 16.0 * qv[:, :, :D2] + (qv[:, :, D2:] + 8.0)
    return packed.astype(jnp.int8), s


def dequantize_kv4(q4: jax.Array, scales: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[B, N, D/2, T] packed + [B, N, T] scales -> [B, N, D, T] floats."""
    hi, lo = _unpack4(q4.astype(jnp.float32))
    full = jnp.concatenate([hi, lo], axis=2)  # [B, N, D, T]
    return (full * scales[:, :, None, :]).astype(dtype)


def quantize_kv(cols: jax.Array, num_heads: int) -> tuple[jax.Array, jax.Array]:
    """Per-(head, token) absmax int8 quantization of K or V columns
    (prefill path; the decode loop quantizes in-kernel).

    cols: [B, H, S] -> (int8 [B, N, D, S], scales f32 [B, N, S]) in the
    cache's [.., N, D, T] orientation.  Scales carry the 1/127 factor so
    dequantization is a single multiply.
    """
    B, H, S = cols.shape
    D = H // num_heads
    c = cols.reshape(B, num_heads, D, S).astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(c), axis=2), 1e-8) / 127.0  # [B, N, S]
    q = jnp.round(c / s[:, :, None, :])
    q = jnp.clip(q, -127, 127).astype(jnp.int8)
    return q, s  # [B, N, D, S]


def dequantize_kv(q8: jax.Array, scales: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[B, N, D, T] int8 + [B, N, T] scales -> [B, N, D, T] floats (prefill
    path / tests)."""
    return (q8.astype(jnp.float32) * scales[:, :, None, :]).astype(dtype)
