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
  in-kernel windowed write is a small async DMA hidden by the loop
  pipeline.  As a bonus the current token attends to its *exact* bf16
  K/V (it is quantized only for later steps).

Cache layout is **window-blocked and K/V-fused**:
data ``[L, NW, B, 2, N, Dc, W]`` int8 and scales ``[L, NW, B, 2, N, W]``
f32, with NW = ceil(T / 128) windows of W = 128 tokens and the ``2`` dim
holding K at 0 / V at 1.  Three properties are load-bearing:

* (Dc, W) as the trailing dims keeps the s8 tiles pad-free ((32, 128)
  tiles; a [.., W, D=64] order would pad 64 lanes to 128 and DOUBLE the
  footprint — measured in r2);
* the WINDOW index is a MAJOR dim (ahead of batch), so one loop
  iteration's fetch ``[rb, 2, hb, Dc, W]`` — a ROW BLOCK of rb batch
  rows, K AND V together — is a single contiguous ~1.3MB HBM run at
  full head count.  Windowing the minor dim instead makes every window
  DMA a strided gather of 128-byte rows (~70 GB/s vs ~600 contiguous,
  measured r3);
* K and V (and both scale tensors) share ONE array, so each iteration
  issues 2 DMAs instead of 4.  The r4 phase microbench showed the
  4-DMA/iteration kernel spent ~10 ms/step (cogview-base B40) on
  per-descriptor issue/wait latency alone — a 5 ms/step *intercept*
  (105 us per layer-call) plus a ~0.5 us/iteration slope tax — while
  the streamed bytes account for only ~7 ms.  Halving the descriptor
  count and doubling the DMA size attacks exactly that term.

Both kernel matmuls are direct batched GEMMs over the fused (row, head)
lanes with no in-kernel transposes (a VPU mul+reduce contraction was
measured 1.6x SLOWER than the batched MXU matvecs at base scale); the
stacked L dim keeps the model's ``lax.scan`` over layers carrying one
buffer, with the *current layer* selected by a scalar-prefetch argument
feeding the manual DMA slices, i.e. the DMA engine reads layer ``li``'s
blocks straight from HBM (an XLA dynamic-slice of a scan carry would be
a whole-layer HBM copy).

Masking matches ops/attention.decode_mask: cached slot kpos is visible iff
kpos < index, the current token is always visible to itself, and invisible
logits are -10000 exactly (reference mpu/sparse_transformer.py:662-663 —
they underflow to probability 0 after the f32 max subtraction).

Per decode step the kernel streams only ``lastw+1 = index // 128 + 1``
LIVE windows of cache instead of the full padded Tp — over a 1024-token
decode with a ~65-token prefix that is ~5.5 of 9 windows on average,
cutting the cache bytes (the dominant term at large batch) by ~1.6x.
Attention accumulates across a row block's windows flash-style (running
max / sum / context carried in the loop); the final window step adds the
current tokens' exact bf16 contribution, normalizes, writes the context,
and performs the windowed cache write-back — at that step the resident
block IS the live window containing ``index``, and the write-back
(column ``index`` replaced with the just-quantized K/V) goes out as 2
DMAs staged 2-deep so the wait is deferred two row blocks.

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


def pick_row_block(batch: int, head_block: int, head_dim: int) -> int:
    """Batch rows fused per DMA-loop iteration.

    Blocking rows amortizes the per-iteration DMA issue/wait and
    small-tile VPU cost (measured ~1.8us/iter at base scale for rb=1 vs
    ~0.7us of streamed bytes — scripts/decode_phase_microbench.py).  The
    ceiling is VMEM: fused in-buffers + 2-deep write-back staging + the
    f32 finalize/compute transients are ~7MB per row at (hb=40, D=64,
    W=128), so rb=2 (~14MB peak) is the largest safe block.  Odd batches
    fall back to 1."""
    per_row = 2 * head_block * head_dim * WRITE_WINDOW  # K+V int8 window
    for rb in (2, 1):
        if batch % rb == 0 and rb * per_row * 9 <= 12 * 1024 * 1024:
            # 9 ~= 2x(in kv int8) + 2x(out kv int8) + 2x(f32 compute
            # converts) + finalize transients, in int8-window units
            return rb
    return 1


def _unpack4(bf: jax.Array) -> tuple[jax.Array, jax.Array]:
    """f32 packed bytes -> (hi, lo) f32 nibble values in [-8, 7].

    Unpacking is pure f32 VPU math — hi = floor(b / 16), lo = b - 16*hi
    - 8 — because Mosaic's integer-shift support on s8 vectors is
    unreliable while floor/mul/sub on f32 are native."""
    hi = jnp.floor(bf * (1.0 / 16.0))
    lo = bf - 16.0 * hi - 8.0
    return hi, lo


def _decode_kernel(s_ref, q_ref, kc_ref, vc_ref, kv_hbm, s_hbm,
                   o_ref, kvo_hbm, so_hbm,
                   buf, sbuf, obuf, osbuf,
                   dsem, ssem, osem, sosem,
                   *, scale, hb, batch, rb, packed):
    """One head-block grid cell runs ALL batch rows: a single manual
    double-buffered DMA loop over the flattened (row block, live window)
    sequence, so the pipeline never drains between rows.

    s_ref (SMEM): [layer, index]; q/kc/vc [B,hb,D] VMEM blocks; the cache
    stays in HBM (memory_space=ANY) and the kernel streams exactly
    ``lastw+1 = index//W + 1`` fused [rb,2,hb,Dc,W] K+V window blocks
    (plus [rb,2,hb,W] scale blocks) per ROW BLOCK of ``rb`` batch rows
    through 2-slot VMEM buffers — iteration i+2's copy is issued right
    after i's compute, crossing row-block boundaries.  2 DMAs per
    iteration, 2 write-back DMAs per row block (see the module docstring
    for why descriptor count is THE perf lever at this scale; all
    alternatives were measured on-chip at cogview-base B40: a
    grid-pipelined version pays ~5.5us of fixed cost per grid step, a
    per-(b,h)-cell manual loop a 12.7ms/step DMA prologue intercept, the
    4-DMA flat loop a 5ms/step issue/wait intercept + ~0.5us/iter tax).

    ``packed`` switches the compute to int4 nibble-packed blocks
    (Dc = D/2, per-element [-7,7], module ``_unpack4`` note); the DMA
    machinery is identical."""
    li = s_ref[0]
    index = s_ref[1]
    h = pl.program_id(0)
    W = WRITE_WINDOW
    lastw = index // W
    lw1 = lastw + 1
    n_rb = batch // rb
    total = n_rb * lw1
    hs = h * hb
    D = q_ref.shape[2]
    D2 = D // 2
    RH = rb * hb  # fused (row, head) lane count per iteration

    def coords(it):
        r = it // lw1
        return r, it - r * lw1

    def copy(it, slot):
        r, w = coords(it)
        b0 = r * rb
        return (
            pltpu.make_async_copy(
                kv_hbm.at[li, w, pl.ds(b0, rb), pl.ds(0, 2), pl.ds(hs, hb)],
                buf.at[slot], dsem.at[slot]),
            pltpu.make_async_copy(
                s_hbm.at[li, w, pl.ds(b0, rb), pl.ds(0, 2), pl.ds(hs, hb)],
                sbuf.at[slot], ssem.at[slot]),
        )

    def start(it, slot):
        for c in copy(it, slot):
            c.start()

    def wait(slot):
        for c in copy(0, slot):  # src index irrelevant for the wait
            c.wait()

    def out_copies(r, oslot):
        b0 = r * rb
        return (
            pltpu.make_async_copy(
                obuf.at[oslot],
                kvo_hbm.at[li, lastw, pl.ds(b0, rb), pl.ds(0, 2),
                           pl.ds(hs, hb)],
                osem.at[oslot]),
            pltpu.make_async_copy(
                osbuf.at[oslot],
                so_hbm.at[li, lastw, pl.ds(b0, rb), pl.ds(0, 2),
                          pl.ds(hs, hb)],
                sosem.at[oslot]),
        )

    def wait_out(oslot):
        for c in out_copies(0, oslot):
            c.wait()

    start(0, 0)

    @pl.when(total > 1)
    def _():
        start(1, 1)

    def body(it, carry):
        m, l, acc = carry
        r, w = coords(it)
        b0 = r * rb
        slot = lax.rem(it, 2)
        wait(slot)

        # new row block: reset the flash accumulators
        reset = w == 0
        m = jnp.where(reset, jnp.full_like(m, -1e30), m)
        l = jnp.where(reset, jnp.zeros_like(l), l)
        acc = jnp.where(reset, jnp.zeros_like(acc), acc)

        kvb = buf[slot]  # [rb, 2, hb, Dc, W] int8
        scb = sbuf[slot]  # [rb, 2, hb, W] f32
        # lax slices, not kvb[:, 0]: jnp fancy-slicing in a kernel lowers
        # to a gather Mosaic has no rule for at these shapes
        kq8 = lax.index_in_dim(kvb, 0, 1, keepdims=False)  # [rb, hb, Dc, W]
        vq8 = lax.index_in_dim(kvb, 1, 1, keepdims=False)
        ks = lax.index_in_dim(scb, 0, 1, keepdims=False).reshape(RH, W)
        vs = lax.index_in_dim(scb, 1, 1, keepdims=False).reshape(RH, W)

        # reshape in f32: Mosaic has no shape-cast rule for collapsing
        # leading dims of 16-bit-packed vectors ([rb,hb,D]bf16 -> [RH,D])
        q32 = q_ref[pl.ds(b0, rb)].astype(jnp.float32).reshape(RH, D)
        q = q32 * scale
        # bf16 dot operands when the model runs bf16: int8 cache values
        # (|x| <= 127) are EXACT in bf16, so only the q/pv operand is
        # rounded (~0.4% rel — second-order next to the cache's own int8
        # rounding), while the s8->bf16 convert feeding an MXU-native
        # bf16 dot is measurably cheaper than the f32 path (the in-loop
        # convert+matvec is the slope cost at base scale).  f32 queries
        # (tests, f32 serving) keep the exact f32 pipeline.
        bf = q_ref.dtype == jnp.bfloat16 and not packed
        if packed:
            q_hi = lax.slice_in_dim(q, 0, D2, axis=1)[:, None, :]
            q_lo = lax.slice_in_dim(q, D2, D, axis=1)[:, None, :]
            k_hi, k_lo = _unpack4(
                kq8.reshape(RH, D2, W).astype(jnp.float32))
            s = (
                lax.dot_general(q_hi, k_hi, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
                + lax.dot_general(q_lo, k_lo, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
            )[:, 0, :]  # [RH, W]
            s = s * ks
        elif bf:
            k = kq8.reshape(RH, D, W).astype(jnp.bfloat16)
            # singleton insert + convert: reshape happens in f32 (no bf16
            # shape-cast rule in Mosaic), the cast runs on the 3D value
            s = lax.dot_general(
                q32[:, None, :].astype(jnp.bfloat16), k,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )[:, 0, :]  # [RH, W]
            s = s * (ks * scale)
        else:
            k = kq8.reshape(RH, D, W).astype(jnp.float32)
            s = lax.dot_general(
                q[:, None, :], k, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )[:, 0, :]  # [RH, W]
            s = s * ks
        kpos = w * W + lax.broadcasted_iota(jnp.int32, (RH, W), 1)
        s = jnp.where(kpos < index, s, MASK_VALUE)
        m_new = jnp.maximum(m, jnp.max(s, axis=1))
        alpha = jnp.exp(m - m_new)  # [RH]
        p = jnp.exp(s - m_new[:, None])  # [RH, W]
        l = l * alpha + jnp.sum(p, axis=1)
        pv = p * vs
        if packed:
            v_hi, v_lo = _unpack4(
                vq8.reshape(RH, D2, W).astype(jnp.float32))
            ctx_hi = lax.dot_general(pv[:, None, :], v_hi,
                                     (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)[:, 0, :]
            ctx_lo = lax.dot_general(pv[:, None, :], v_lo,
                                     (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)[:, 0, :]
            ctx = jnp.concatenate([ctx_hi, ctx_lo], axis=1)  # [RH, D]
        elif bf:
            v = vq8.reshape(RH, D, W).astype(jnp.bfloat16)
            ctx = lax.dot_general(
                pv[:, None, :].astype(jnp.bfloat16), v,
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )[:, 0, :]  # [RH, D]
        else:
            v = vq8.reshape(RH, D, W).astype(jnp.float32)
            ctx = lax.dot_general(
                pv[:, None, :], v, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )[:, 0, :]  # [RH, D]
        acc = acc * alpha[:, None] + ctx

        @pl.when(w == lastw)
        def _finalize():
            # ---- current tokens attend to their exact bf16 columns ----
            kc = kc_ref[pl.ds(b0, rb)].reshape(RH, D).astype(jnp.float32)
            vc = vc_ref[pl.ds(b0, rb)].reshape(RH, D).astype(jnp.float32)
            s_cur = jnp.sum(q * kc, axis=1)  # [RH]
            m_fin = jnp.maximum(m_new, s_cur)
            a2 = jnp.exp(m_new - m_fin)
            p_cur = jnp.exp(s_cur - m_fin)
            l_fin = l * a2 + p_cur
            out = acc * a2[:, None] + p_cur[:, None] * vc
            o_ref[pl.ds(b0, rb)] = (
                out / l_fin[:, None]).reshape(rb, hb, D).astype(o_ref.dtype)

            # ---- quantize the current columns (for FUTURE steps) ----
            # kept f32 until the windowed write: Mosaic only supports
            # minor-dim broadcasts for 32-bit types
            qmax = 7.0 if packed else 127.0
            ks_new = jnp.maximum(jnp.max(jnp.abs(kc), axis=1), 1e-8) / qmax
            vs_new = jnp.maximum(jnp.max(jnp.abs(vc), axis=1), 1e-8) / qmax
            kq_new = jnp.round(kc / ks_new[:, None])  # [RH, D]
            vq_new = jnp.round(vc / vs_new[:, None])
            if packed:
                def _pack(x):  # [RH, D] clipped nibbles -> [RH, D2] bytes
                    x = jnp.clip(x, -7.0, 7.0)
                    hi = lax.slice_in_dim(x, 0, D2, axis=1)
                    lo = lax.slice_in_dim(x, D2, D, axis=1)
                    return 16.0 * hi + (lo + 8.0)
                kq_new = _pack(kq_new)
                vq_new = _pack(vq_new)
            Dc = kq_new.shape[1]

            # ---- write-back: window ``lastw`` (resident in this slot)
            # with the new columns inserted; 2-deep staging defers the
            # wait until the slot is reused two row blocks later.  The
            # f32 window converts are chunked per (row, K/V) so the
            # transients stay ~1.3MB each ----
            oslot = lax.rem(r, 2)

            @pl.when(r >= 2)
            def _():
                wait_out(oslot)

            col = index - lastw * W
            onehot = lax.broadcasted_iota(jnp.int32, (hb, W), 1) == col
            onehot3 = lax.broadcasted_iota(jnp.int32, (hb, Dc, W), 2) == col
            for j in range(rb):
                for t, newq, news, qsrc in ((0, kq_new, ks_new, kq8),
                                            (1, vq_new, vs_new, vq8)):
                    # insert in the INT8 domain: broadcasting the new
                    # column to [hb, Dc, W] f32 then casting once is ~3x
                    # fewer vector passes than the old convert-the-whole-
                    # window-to-f32 / where / cast-back chain (the
                    # finalize was the measured 5ms/step intercept at
                    # base B40; the resident window bytes pass through
                    # untouched as s8).  Minor-dim broadcasts must stay
                    # 32-bit (Mosaic), hence broadcast-then-cast.
                    win8 = lax.index_in_dim(qsrc, j, 0, keepdims=False)
                    nq = lax.slice_in_dim(newq, j * hb, (j + 1) * hb, axis=0)
                    nq8 = jnp.broadcast_to(
                        nq[:, :, None], (hb, Dc, W)).astype(jnp.int8)
                    obuf[oslot, j, t] = jnp.where(onehot3, nq8, win8)
                    swin = lax.index_in_dim(
                        lax.index_in_dim(scb, j, 0, keepdims=False),
                        t, 0, keepdims=False)  # [hb, W]
                    ns = lax.slice_in_dim(news, j * hb, (j + 1) * hb, axis=0)
                    osbuf[oslot, j, t] = jnp.where(onehot, ns[:, None], swin)
            for c in out_copies(r, oslot):
                c.start()

        # issue i+2's prefetch only AFTER _finalize: it reuses this slot,
        # and finalize still reads the resident window (buf/sbuf[slot]) to
        # stage the write-back — starting the copy earlier races the
        # overwrite against those reads
        @pl.when(it + 2 < total)
        def _():
            start(it + 2, slot)

        return m_new, l, acc

    m0 = jnp.full((RH,), -1e30, jnp.float32)
    l0 = jnp.zeros((RH,), jnp.float32)
    acc0 = jnp.zeros((RH, D), jnp.float32)
    lax.fori_loop(0, total, body, (m0, l0, acc0))

    # drain the last (up to two) staged write-backs
    if n_rb >= 2:
        wait_out((n_rb - 2) % 2)
    wait_out((n_rb - 1) % 2)


def _shard_over_batch(fn, data_axis, model_axis, q, k_col, v_col, kv, s,
                      layer_idx, index):
    """Run the quantized-decode kernel per mesh shard: batch dims sharded
    over ``data_axis`` (cache dim 2, columns dim 0), HEAD dims over
    ``model_axis`` (cache dim 4, columns dim 1; the window dim 1 stays
    unsharded), scalars replicated.  Attention is (batch row, head)-local,
    so the kernel needs no cross-shard collectives either way.  Uses the
    ambient mesh (jax.set_mesh)."""
    P_ = jax.sharding.PartitionSpec
    col = P_(data_axis, model_axis)
    cache = P_(None, None, data_axis, None, model_axis)
    rep = P_()
    return jax.shard_map(
        fn,
        in_specs=(col, col, col, cache, cache, rep, rep),
        out_specs=(col, cache, cache),
        # pallas_call out_shapes carry no varying-mesh-axes metadata; the
        # kernel is per-shard pure so the vma check has nothing to verify
        check_vma=False,
    )(q, k_col, v_col, kv, s, layer_idx, index)


def decode_attention_quant(
    q: jax.Array,  # [B, N, D] current token's queries (compute dtype)
    k_col: jax.Array,  # [B, N, D] current token's key (compute dtype)
    v_col: jax.Array,  # [B, N, D] current token's value
    kv8: jax.Array,  # [L, NW, B, 2, N, Dc, W] int8 fused cache
    kvscale: jax.Array,  # [L, NW, B, 2, N, W] f32 fused scales
    layer_idx: jax.Array,  # scalar int32
    index: jax.Array,  # scalar int32: current absolute position
    *,
    head_block: int | None = None,
    row_block: int | None = None,
    interpret: bool = False,
    data_axis: str | None = None,
    model_axis: str | None = None,
):
    """-> (ctx [B, N, D] in q.dtype, kv8', kvscale').

    The cache arrays are donated (input_output_aliases); layer ``layer_idx``
    gets slot ``index`` updated with the quantized (k_col, v_col).
    ``Dc == D`` selects the int8 kernel, ``Dc == D/2`` the packed-int4
    one (same DMA machinery, see module notes).  Falls back to interpret
    mode on CPU.  ``data_axis``/``model_axis`` run the kernel per shard
    of an ambient mesh — batch rows over data, heads over model
    (multi-chip DP/TP decode over the quantized cache; attention is
    (row, head)-local so no collectives).  ``row_block`` batch rows are
    processed per DMA-loop iteration (default: the largest of 2/1 that
    divides B and fits the VMEM budget — see _decode_kernel on why
    blocking rows and fusing DMAs are the perf levers)."""
    if data_axis is not None or model_axis is not None:
        fn = functools.partial(decode_attention_quant,
                               head_block=head_block, row_block=row_block,
                               interpret=interpret)
        return _shard_over_batch(fn, data_axis, model_axis, q, k_col, v_col,
                                 kv8, kvscale, layer_idx, index)
    B, N, D = q.shape
    L, nw, _, _, _, Dc, W = kv8.shape
    packed = Dc == D // 2 and Dc != D
    assert W == WRITE_WINDOW and kv8.shape == (L, nw, B, 2, N, Dc, W), kv8.shape
    assert packed or Dc == D, (Dc, D)
    assert kvscale.shape == (L, nw, B, 2, N, W), kvscale.shape
    scale = 1.0 / math.sqrt(D)
    # int4: budget on the UNPACKED f32 footprint (each packed byte becomes
    # two f32 lanes), so size the head block as if elements were 2*D wide
    hb = head_block or pick_head_block(N, 2 * D if packed else D, W)
    assert N % hb == 0
    rb = row_block or (1 if packed else pick_row_block(B, hb, D))
    assert B % rb == 0, (B, rb)
    if not interpret:
        interpret = jax.default_backend() == "cpu"

    scalars = jnp.stack([jnp.asarray(layer_idx, jnp.int32),
                         jnp.asarray(index, jnp.int32)])
    col_spec = pl.BlockSpec((B, hb, D), lambda h, s: (0, h, 0))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // hb,),
        in_specs=[col_spec, col_spec, col_spec, any_spec, any_spec],
        out_specs=[col_spec, any_spec, any_spec],
        scratch_shapes=[
            pltpu.VMEM((2, rb, 2, hb, Dc, W), jnp.int8),   # buf (K+V in)
            pltpu.VMEM((2, rb, 2, hb, W), jnp.float32),    # sbuf (scales in)
            pltpu.VMEM((2, rb, 2, hb, Dc, W), jnp.int8),   # obuf (2-deep out)
            pltpu.VMEM((2, rb, 2, hb, W), jnp.float32),    # osbuf
            pltpu.SemaphoreType.DMA((2,)),                 # dsem
            pltpu.SemaphoreType.DMA((2,)),                 # ssem
            pltpu.SemaphoreType.DMA((2,)),                 # osem
            pltpu.SemaphoreType.DMA((2,)),                 # sosem
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((B, N, D), q.dtype),
        jax.ShapeDtypeStruct(kv8.shape, jnp.int8),
        jax.ShapeDtypeStruct(kvscale.shape, jnp.float32),
    ]
    # tensor input i (after the scalar-prefetch arg) aliases output slot:
    # kv8 -> 1, kvscale -> 2
    aliases = {4: 1, 5: 2}
    ctx, kv8, kvscale = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale, hb=hb, batch=B, rb=rb,
                          packed=packed),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
    )(scalars, q, k_col, v_col, kv8, kvscale)
    return ctx, kv8, kvscale


# int4 (cfg.kv_cache_dtype="int4") shares the kernel: the packed layout
# [L, NW, B, 2, N, D/2, W] is detected from Dc.  Accuracy: per-(head,
# token) absmax/7 scales — one sign bit + 3 magnitude bits per element,
# ~16x the int8 rounding error; shipped as an OPT-IN serving mode (the
# int8 cache stays the default).
decode_attention_quant4 = decode_attention_quant


def quantize_kv4(cols: jax.Array, num_heads: int) -> tuple[jax.Array, jax.Array]:
    """Per-(head, token) absmax int4 quantization + nibble packing
    (prefill path).  cols [B, H, S] -> (packed int8 [B, N, D/2, S],
    scales f32 [B, N, S]).  Byte (d2, t) holds head-dim row d2 in the
    high nibble (signed, [-7, 7]) and row d2 + D/2 in the low nibble
    (stored biased +8, [1, 15])."""
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


# ------------------------------------------------------------------ #
# fused window-blocked cache scatter/gather (prefill path)
# ------------------------------------------------------------------ #


def scatter_kv_columns(cache: jax.Array, kcols: jax.Array, vcols: jax.Array,
                       layer_idx, index) -> jax.Array:
    """Write K/V columns [B, N, Dc, S] into the fused window-blocked
    cache [L, NW, B, 2, N, Dc, W] at absolute slots [index, index+S) of
    layer ``layer_idx`` — a read-modify-write of only the touched windows
    (prefill; decode steps write through the kernel instead)."""
    L, NW, B, _, N, Dc, W = cache.shape
    S = kcols.shape[3]
    nt = min(NW, (S - 1) // W + 2)  # max windows a span of S can touch
    w0 = jnp.clip(jnp.asarray(index) // W, 0, NW - nt)
    win = lax.dynamic_slice(
        cache, (layer_idx, w0, 0, 0, 0, 0, 0), (1, nt, B, 2, N, Dc, W))[0]
    flat = win.transpose(1, 2, 3, 4, 0, 5).reshape(B, 2, N, Dc, nt * W)
    cols = jnp.stack([kcols, vcols], axis=1).astype(cache.dtype)
    flat = lax.dynamic_update_slice(flat, cols, (0, 0, 0, 0, index - w0 * W))
    back = flat.reshape(B, 2, N, Dc, nt, W).transpose(4, 0, 1, 2, 3, 5)
    return lax.dynamic_update_slice(
        cache, back[None], (layer_idx, w0, 0, 0, 0, 0, 0))


def scatter_kv_scales(scales: jax.Array, kscols: jax.Array, vscols: jax.Array,
                      layer_idx, index) -> jax.Array:
    """Same for the fused [L, NW, B, 2, N, W] scale array; cols [B, N, S]."""
    L, NW, B, _, N, W = scales.shape
    S = kscols.shape[2]
    nt = min(NW, (S - 1) // W + 2)
    w0 = jnp.clip(jnp.asarray(index) // W, 0, NW - nt)
    win = lax.dynamic_slice(
        scales, (layer_idx, w0, 0, 0, 0, 0), (1, nt, B, 2, N, W))[0]
    flat = win.transpose(1, 2, 3, 0, 4).reshape(B, 2, N, nt * W)
    sc = jnp.stack([kscols, vscols], axis=1).astype(scales.dtype)
    flat = lax.dynamic_update_slice(flat, sc, (0, 0, 0, index - w0 * W))
    back = flat.reshape(B, 2, N, nt, W).transpose(3, 0, 1, 2, 4)
    return lax.dynamic_update_slice(
        scales, back[None], (layer_idx, w0, 0, 0, 0, 0))


def gather_kv(cache: jax.Array, layer_idx) -> tuple[jax.Array, jax.Array]:
    """Fused cache [L, NW, B, 2, N, Dc, W] -> layer ``layer_idx`` as
    column-form (K [B, N, Dc, NW*W], V likewise) — prefill dense path."""
    L, NW, B, _, N, Dc, W = cache.shape
    win = lax.dynamic_slice(
        cache, (layer_idx, 0, 0, 0, 0, 0, 0), (1, NW, B, 2, N, Dc, W))[0]
    cols = win.transpose(1, 2, 3, 4, 0, 5).reshape(B, 2, N, Dc, NW * W)
    return cols[:, 0], cols[:, 1]


def gather_kv_scales(scales: jax.Array, layer_idx) -> tuple[jax.Array, jax.Array]:
    """[L, NW, B, 2, N, W] -> (K scales [B, N, NW*W], V scales)."""
    L, NW, B, _, N, W = scales.shape
    win = lax.dynamic_slice(
        scales, (layer_idx, 0, 0, 0, 0, 0), (1, NW, B, 2, N, W))[0]
    cols = win.transpose(1, 2, 3, 0, 4).reshape(B, 2, N, NW * W)
    return cols[:, 0], cols[:, 1]


def fused_from_columns(kcol: jax.Array, vcol: jax.Array) -> jax.Array:
    """Column-form K and V [L, B, N, Dc, T] -> fused window-blocked
    [L, NW, B, 2, N, Dc, W] (T must be a WRITE_WINDOW multiple).  Scale
    pairs [L, B, N, T] map to [L, NW, B, 2, N, W].  Test/tooling helper."""
    W = WRITE_WINDOW
    kv = jnp.stack([kcol, vcol], axis=2)  # [L, B, 2, N, (Dc,) T]
    if kcol.ndim == 5:
        L, B, _, N, Dc, T = kv.shape
        return kv.reshape(L, B, 2, N, Dc, T // W, W).transpose(
            0, 5, 1, 2, 3, 4, 6)
    L, B, _, N, T = kv.shape
    return kv.reshape(L, B, 2, N, T // W, W).transpose(0, 4, 1, 2, 3, 5)


def columns_from_fused(blk: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Inverse of :func:`fused_from_columns` -> (K columns, V columns)."""
    if blk.ndim == 7:
        L, NW, B, _, N, Dc, W = blk.shape
        col = blk.transpose(0, 2, 3, 4, 5, 1, 6).reshape(
            L, B, 2, N, Dc, NW * W)
        return col[:, :, 0], col[:, :, 1]
    L, NW, B, _, N, W = blk.shape
    col = blk.transpose(0, 2, 3, 4, 1, 5).reshape(L, B, 2, N, NW * W)
    return col[:, :, 0], col[:, :, 1]


def quantize_kv(cols: jax.Array, num_heads: int) -> tuple[jax.Array, jax.Array]:
    """Per-(head, token) absmax int8 quantization of K or V columns
    (prefill path; the decode loop quantizes in-kernel).

    cols: [B, H, S] -> (int8 [B, N, D, S], scales f32 [B, N, S]) in
    column form; ``scatter_kv_columns`` folds these into the fused cache.
    Scales carry the 1/127 factor so dequantization is a single multiply.
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
