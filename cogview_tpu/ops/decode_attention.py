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

Cache layout is **window-blocked**: [L, B, NW, N, D, W] with
NW = ceil(T / 128) windows of W = 128 tokens (scales [L, B, NW, N, W]
f32).  Two properties are load-bearing:

* (D, W) as the trailing dims keeps the s8 tiles pad-free ((32, 128)
  tiles; a [.., W, D=64] order would pad 64 lanes to 128 and DOUBLE the
  footprint — measured in r2);
* the WINDOW index is a MAJOR dim, so one grid cell's cache block
  [1, 1, 1, hb, D, W] is a single contiguous ~320KB HBM run.  Windowing
  the previous [L, B, N, D, Tp] layout along its minor dim instead makes
  every window DMA a strided gather of 128-BYTE rows, which collapsed
  streaming bandwidth to ~70 GB/s on the chip (vs ~600 GB/s contiguous;
  measured r3) — a kernel-level slowdown that more than erased the
  live-window win.

Both kernel matmuls are direct batched GEMMs over the head block with no
in-kernel transposes; the stacked L dim keeps the model's ``lax.scan``
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


def _decode_kernel(s_ref, q_ref, kc_ref, vc_ref, k_hbm, v_hbm, ks_hbm, vs_hbm,
                   o_ref, ko_hbm, vo_hbm, kso_hbm, vso_hbm,
                   kbuf, vbuf, ksbuf, vsbuf, kout, vout, ksout, vsout,
                   ksem, vsem, kssem, vssem, kosem, vosem, ksosem, vsosem,
                   *, scale, hb, batch):
    """One head-block grid cell runs ALL batch rows: a single manual
    double-buffered DMA loop over the flattened (batch row, live window)
    sequence, so the pipeline never drains between rows.

    s_ref (SMEM): [layer, index]; q/kc/vc [B,hb,D] VMEM blocks; the cache
    arrays stay in HBM (memory_space=ANY) and the kernel streams exactly
    ``lastw+1 = index//W + 1`` contiguous [hb,D,W] window blocks of K and
    V (plus [hb,W] scale rows) per row through 2-slot VMEM buffers —
    iteration i+2's copy is issued right after i's compute, crossing row
    boundaries.  Attention accumulates flash-style across a row's
    windows; at a row's last window the current token's exact column is
    folded in, the context written to o[b], and the write-back window
    (holding slot ``index``, resident in the last buffer slot) is updated
    with the quantized current column and DMA'd back to the aliased cache
    in ONE aligned block write, staged 2-deep so the wait is deferred two
    rows.

    Why this shape (both alternatives measured on-chip at cogview-base
    B40): a grid-pipelined version (innermost window grid dim, clamped
    index_map) pays ~5.5us of fixed cost per grid STEP — the per-step
    flush of the windowed write-back outputs swamps the streamed bytes
    (~2ms/layer-call vs the ~0.35ms roofline); a per-(b,h)-cell manual
    loop fixes the marginal bandwidth (~745 GB/s per extra window) but
    pays ~6.6us of DMA prologue/epilogue latency per CELL = a 12.7ms/step
    intercept at 48 layers.  One flat loop leaves only per-layer-call
    constants."""
    li = s_ref[0]
    index = s_ref[1]
    h = pl.program_id(0)
    W = WRITE_WINDOW
    lastw = index // W
    lw1 = lastw + 1
    total = batch * lw1
    hs = h * hb
    D = q_ref.shape[2]

    def coords(it):
        b = it // lw1
        return b, it - b * lw1

    def copy(it, slot):
        b, w = coords(it)
        return (
            pltpu.make_async_copy(
                k_hbm.at[li, b, w, pl.ds(hs, hb)], kbuf.at[slot], ksem.at[slot]),
            pltpu.make_async_copy(
                v_hbm.at[li, b, w, pl.ds(hs, hb)], vbuf.at[slot], vsem.at[slot]),
            pltpu.make_async_copy(
                ks_hbm.at[li, b, w, pl.ds(hs, hb)], ksbuf.at[slot], kssem.at[slot]),
            pltpu.make_async_copy(
                vs_hbm.at[li, b, w, pl.ds(hs, hb)], vsbuf.at[slot], vssem.at[slot]),
        )

    def start(it, slot):
        for c in copy(it, slot):
            c.start()

    def wait(slot):
        for c in copy(0, slot):  # src index irrelevant for the wait
            c.wait()

    def out_copies(b, oslot):
        lw = lastw
        return (
            pltpu.make_async_copy(
                kout.at[oslot], ko_hbm.at[li, b, lw, pl.ds(hs, hb)],
                kosem.at[oslot]),
            pltpu.make_async_copy(
                vout.at[oslot], vo_hbm.at[li, b, lw, pl.ds(hs, hb)],
                vosem.at[oslot]),
            pltpu.make_async_copy(
                ksout.at[oslot], kso_hbm.at[li, b, lw, pl.ds(hs, hb)],
                ksosem.at[oslot]),
            pltpu.make_async_copy(
                vsout.at[oslot], vso_hbm.at[li, b, lw, pl.ds(hs, hb)],
                vsosem.at[oslot]),
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
        b, w = coords(it)
        slot = lax.rem(it, 2)
        wait(slot)

        # new row: reset the flash accumulators
        reset = w == 0
        m = jnp.where(reset, jnp.full_like(m, -1e30), m)
        l = jnp.where(reset, jnp.zeros_like(l), l)
        acc = jnp.where(reset, jnp.zeros_like(acc), acc)

        q = q_ref[b].astype(jnp.float32) * scale  # [hb, D]
        k = kbuf[slot].astype(jnp.float32)  # [hb, D, W]
        s = lax.dot_general(
            q[:, None, :], k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, 0, :]  # [hb, W]
        s = s * ksbuf[slot]
        kpos = w * W + lax.broadcasted_iota(jnp.int32, (hb, W), 1)
        s = jnp.where(kpos < index, s, MASK_VALUE)
        m_new = jnp.maximum(m, jnp.max(s, axis=1))
        alpha = jnp.exp(m - m_new)  # [hb]
        p = jnp.exp(s - m_new[:, None])  # [hb, W]
        l = l * alpha + jnp.sum(p, axis=1)
        pv = p * vsbuf[slot]
        v = vbuf[slot].astype(jnp.float32)  # [hb, D, W]
        ctx = lax.dot_general(
            pv[:, None, :], v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, 0, :]  # [hb, D]
        acc = acc * alpha[:, None] + ctx

        @pl.when(w == lastw)
        def _finalize():
            # ---- current token attends to its exact bf16 column ----
            kc = kc_ref[b].astype(jnp.float32)  # [hb, D]
            vc = vc_ref[b].astype(jnp.float32)
            s_cur = jnp.sum(q * kc, axis=1)  # [hb]
            m_fin = jnp.maximum(m_new, s_cur)
            a2 = jnp.exp(m_new - m_fin)
            p_cur = jnp.exp(s_cur - m_fin)
            l_fin = l * a2 + p_cur
            out = acc * a2[:, None] + p_cur[:, None] * vc
            o_ref[b] = (out / l_fin[:, None]).astype(o_ref.dtype)

            # ---- quantize the current column (for FUTURE steps) ----
            # kept f32 until the windowed write: Mosaic only supports
            # minor-dim broadcasts for 32-bit types
            ks_new = jnp.maximum(jnp.max(jnp.abs(kc), axis=1), 1e-8) / 127.0
            vs_new = jnp.maximum(jnp.max(jnp.abs(vc), axis=1), 1e-8) / 127.0
            kq_new = jnp.round(kc / ks_new[:, None])  # [hb, D] in [-127,127]
            vq_new = jnp.round(vc / vs_new[:, None])

            # ---- write-back: window ``lastw`` (resident in this slot)
            # with the new column inserted; 2-deep staging defers the
            # wait until the slot is reused two rows later ----
            oslot = lax.rem(b, 2)

            @pl.when(b >= 2)
            def _():
                wait_out(oslot)

            col = index - lastw * W
            onehot = lax.broadcasted_iota(jnp.int32, (hb, W), 1) == col
            onehot3 = lax.broadcasted_iota(jnp.int32, (hb, D, W), 2) == col
            k_win = kbuf[slot].astype(jnp.float32)
            v_win = vbuf[slot].astype(jnp.float32)
            kout[oslot] = jnp.where(
                onehot3, kq_new[:, :, None], k_win).astype(jnp.int8)
            vout[oslot] = jnp.where(
                onehot3, vq_new[:, :, None], v_win).astype(jnp.int8)
            ksout[oslot] = jnp.where(onehot, ks_new[:, None], ksbuf[slot])
            vsout[oslot] = jnp.where(onehot, vs_new[:, None], vsbuf[slot])
            for c in out_copies(b, oslot):
                c.start()

        # issue i+2's prefetch only AFTER _finalize: it reuses this slot,
        # and finalize still reads the resident window (kbuf/vbuf/ksbuf/
        # vsbuf[slot]) to stage the write-back — starting the copy earlier
        # races the overwrite against those reads
        @pl.when(it + 2 < total)
        def _():
            start(it + 2, slot)

        return m_new, l, acc

    m0 = jnp.full((hb,), -1e30, jnp.float32)
    l0 = jnp.zeros((hb,), jnp.float32)
    acc0 = jnp.zeros((hb, D), jnp.float32)
    lax.fori_loop(0, total, body, (m0, l0, acc0))

    # drain the last (up to two) staged write-backs
    if batch >= 2:
        wait_out((batch - 2) % 2)
    wait_out((batch - 1) % 2)


def _shard_over_batch(fn, data_axis, model_axis, q, k_col, v_col, kq, vq,
                      ks, vs, layer_idx, index):
    """Run a quantized-decode kernel per mesh shard: batch dims sharded
    over ``data_axis`` (cache dim 1, columns dim 0), HEAD dims over
    ``model_axis`` (cache dim 3, columns dim 1; the window dim 2 stays
    unsharded), scalars replicated.  Attention is (batch row, head)-local,
    so the kernel needs no cross-shard collectives either way.  Uses the
    ambient mesh (jax.set_mesh)."""
    P_ = jax.sharding.PartitionSpec
    col = P_(data_axis, model_axis)
    cache = P_(None, data_axis, None, model_axis)
    scl = P_(None, data_axis, None, model_axis)
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
    L, _, nw, _, _, W = k8.shape
    assert W == WRITE_WINDOW and k8.shape == (L, B, nw, N, D, W), k8.shape
    assert kscale.shape == (L, B, nw, N, W), kscale.shape
    scale = 1.0 / math.sqrt(D)
    hb = head_block or pick_head_block(N, D, W)
    assert N % hb == 0
    if not interpret:
        interpret = jax.default_backend() == "cpu"

    scalars = jnp.stack([jnp.asarray(layer_idx, jnp.int32),
                         jnp.asarray(index, jnp.int32)])
    col_spec = pl.BlockSpec((B, hb, D), lambda h, s: (0, h, 0))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // hb,),
        in_specs=[col_spec, col_spec, col_spec,
                  any_spec, any_spec, any_spec, any_spec],
        out_specs=[col_spec, any_spec, any_spec, any_spec, any_spec],
        scratch_shapes=[
            pltpu.VMEM((2, hb, D, W), jnp.int8),   # kbuf
            pltpu.VMEM((2, hb, D, W), jnp.int8),   # vbuf
            pltpu.VMEM((2, hb, W), jnp.float32),   # ksbuf
            pltpu.VMEM((2, hb, W), jnp.float32),   # vsbuf
            pltpu.VMEM((2, hb, D, W), jnp.int8),   # kout (2-deep staging)
            pltpu.VMEM((2, hb, D, W), jnp.int8),   # vout
            pltpu.VMEM((2, hb, W), jnp.float32),   # ksout
            pltpu.VMEM((2, hb, W), jnp.float32),   # vsout
            pltpu.SemaphoreType.DMA((2,)),         # ksem
            pltpu.SemaphoreType.DMA((2,)),         # vsem
            pltpu.SemaphoreType.DMA((2,)),         # kssem
            pltpu.SemaphoreType.DMA((2,)),         # vssem
            pltpu.SemaphoreType.DMA((2,)),         # kosem
            pltpu.SemaphoreType.DMA((2,)),         # vosem
            pltpu.SemaphoreType.DMA((2,)),         # ksosem
            pltpu.SemaphoreType.DMA((2,)),         # vsosem
        ],
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
        functools.partial(_decode_kernel, scale=scale, hb=hb, batch=B),
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


def _decode_kernel4(s_ref, q_ref, kc_ref, vc_ref, k_hbm, v_hbm, ks_hbm, vs_hbm,
                    o_ref, ko_hbm, vo_hbm, kso_hbm, vso_hbm,
                    kbuf, vbuf, ksbuf, vsbuf, kout, vout, ksout, vsout,
                    ksem, vsem, kssem, vssem, kosem, vosem, ksosem, vsosem,
                    *, scale, hb, batch):
    """int4 flavor of _decode_kernel: the same flat manual-DMA loop over
    (batch row, live window) with D/2 packed cache rows, unpacked per
    window in VMEM (see the module packing note)."""
    li = s_ref[0]
    index = s_ref[1]
    h = pl.program_id(0)
    W = WRITE_WINDOW
    lastw = index // W
    lw1 = lastw + 1
    total = batch * lw1
    hs = h * hb
    D = q_ref.shape[2]
    D2 = D // 2

    def coords(it):
        b = it // lw1
        return b, it - b * lw1

    def copy(it, slot):
        b, w = coords(it)
        return (
            pltpu.make_async_copy(
                k_hbm.at[li, b, w, pl.ds(hs, hb)], kbuf.at[slot], ksem.at[slot]),
            pltpu.make_async_copy(
                v_hbm.at[li, b, w, pl.ds(hs, hb)], vbuf.at[slot], vsem.at[slot]),
            pltpu.make_async_copy(
                ks_hbm.at[li, b, w, pl.ds(hs, hb)], ksbuf.at[slot], kssem.at[slot]),
            pltpu.make_async_copy(
                vs_hbm.at[li, b, w, pl.ds(hs, hb)], vsbuf.at[slot], vssem.at[slot]),
        )

    def start(it, slot):
        for c in copy(it, slot):
            c.start()

    def wait(slot):
        for c in copy(0, slot):  # src index irrelevant for the wait
            c.wait()

    def out_copies(b, oslot):
        lw = lastw
        return (
            pltpu.make_async_copy(
                kout.at[oslot], ko_hbm.at[li, b, lw, pl.ds(hs, hb)],
                kosem.at[oslot]),
            pltpu.make_async_copy(
                vout.at[oslot], vo_hbm.at[li, b, lw, pl.ds(hs, hb)],
                vosem.at[oslot]),
            pltpu.make_async_copy(
                ksout.at[oslot], kso_hbm.at[li, b, lw, pl.ds(hs, hb)],
                ksosem.at[oslot]),
            pltpu.make_async_copy(
                vsout.at[oslot], vso_hbm.at[li, b, lw, pl.ds(hs, hb)],
                vsosem.at[oslot]),
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
        b, w = coords(it)
        slot = lax.rem(it, 2)
        wait(slot)

        reset = w == 0
        m = jnp.where(reset, jnp.full_like(m, -1e30), m)
        l = jnp.where(reset, jnp.zeros_like(l), l)
        acc = jnp.where(reset, jnp.zeros_like(acc), acc)

        q = q_ref[b].astype(jnp.float32) * scale  # [hb, D]
        # lax.slice_in_dim, not q[:, :D2]: jnp fancy-slicing lowers to a
        # gather Mosaic has no rule for at these shapes
        q_hi = lax.slice_in_dim(q, 0, D2, axis=1)[:, None, :]  # [hb, 1, D2]
        q_lo = lax.slice_in_dim(q, D2, D, axis=1)[:, None, :]
        k_hi, k_lo = _unpack4(kbuf[slot].astype(jnp.float32))  # [hb, D2, W]
        s = (
            lax.dot_general(q_hi, k_hi, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
            + lax.dot_general(q_lo, k_lo, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
        )[:, 0, :]  # [hb, W]
        s = s * ksbuf[slot]
        kpos = w * W + lax.broadcasted_iota(jnp.int32, (hb, W), 1)
        s = jnp.where(kpos < index, s, MASK_VALUE)
        m_new = jnp.maximum(m, jnp.max(s, axis=1))
        alpha = jnp.exp(m - m_new)  # [hb]
        p = jnp.exp(s - m_new[:, None])  # [hb, W]
        l = l * alpha + jnp.sum(p, axis=1)
        pv = p * vsbuf[slot]
        v_hi, v_lo = _unpack4(vbuf[slot].astype(jnp.float32))
        ctx_hi = lax.dot_general(pv[:, None, :], v_hi,
                                 (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)[:, 0, :]
        ctx_lo = lax.dot_general(pv[:, None, :], v_lo,
                                 (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)[:, 0, :]
        ctx = jnp.concatenate([ctx_hi, ctx_lo], axis=1)  # [hb, D]
        acc = acc * alpha[:, None] + ctx

        @pl.when(w == lastw)
        def _finalize():
            kc = kc_ref[b].astype(jnp.float32)
            vc = vc_ref[b].astype(jnp.float32)
            s_cur = jnp.sum(q * kc, axis=1)
            m_fin = jnp.maximum(m_new, s_cur)
            a2 = jnp.exp(m_new - m_fin)
            p_cur = jnp.exp(s_cur - m_fin)
            l_fin = l * a2 + p_cur
            out = acc * a2[:, None] + p_cur[:, None] * vc
            o_ref[b] = (out / l_fin[:, None]).astype(o_ref.dtype)

            # ---- quantize + pack the current column ----
            ks_new = jnp.maximum(jnp.max(jnp.abs(kc), axis=1), 1e-8) / 7.0
            vs_new = jnp.maximum(jnp.max(jnp.abs(vc), axis=1), 1e-8) / 7.0
            kq = jnp.clip(jnp.round(kc / ks_new[:, None]), -7.0, 7.0)
            vq = jnp.clip(jnp.round(vc / vs_new[:, None]), -7.0, 7.0)

            def _pack(x):  # [hb, D] -> [hb, D2]; lax slices (gather-free)
                hi = lax.slice_in_dim(x, 0, D2, axis=1)
                lo = lax.slice_in_dim(x, D2, D, axis=1)
                return 16.0 * hi + (lo + 8.0)

            oslot = lax.rem(b, 2)

            @pl.when(b >= 2)
            def _():
                wait_out(oslot)

            col = index - lastw * W
            onehot = lax.broadcasted_iota(jnp.int32, (hb, W), 1) == col
            onehot3 = lax.broadcasted_iota(jnp.int32, (hb, D2, W), 2) == col
            k_win = kbuf[slot].astype(jnp.float32)
            v_win = vbuf[slot].astype(jnp.float32)
            kout[oslot] = jnp.where(
                onehot3, _pack(kq)[:, :, None], k_win).astype(jnp.int8)
            vout[oslot] = jnp.where(
                onehot3, _pack(vq)[:, :, None], v_win).astype(jnp.int8)
            ksout[oslot] = jnp.where(onehot, ks_new[:, None], ksbuf[slot])
            vsout[oslot] = jnp.where(onehot, vs_new[:, None], vsbuf[slot])
            for c in out_copies(b, oslot):
                c.start()

        # issue i+2's prefetch only AFTER _finalize (it reuses this slot,
        # and finalize reads the resident window for the write-back)
        @pl.when(it + 2 < total)
        def _():
            start(it + 2, slot)

        return m_new, l, acc

    m0 = jnp.full((hb,), -1e30, jnp.float32)
    l0 = jnp.zeros((hb,), jnp.float32)
    acc0 = jnp.zeros((hb, D), jnp.float32)
    lax.fori_loop(0, total, body, (m0, l0, acc0))

    if batch >= 2:
        wait_out((batch - 2) % 2)
    wait_out((batch - 1) % 2)


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
    L, _, nw, _, D2, W = k4.shape
    assert W == WRITE_WINDOW and D2 == D // 2, k4.shape
    assert kscale.shape == (L, B, nw, N, W), kscale.shape
    scale = 1.0 / math.sqrt(D)
    # budget on the UNPACKED f32 footprint, not the packed bytes: each
    # packed byte becomes two f32 lanes (8x), so size the head block as if
    # elements were 2*D wide (per resident 128-token window)
    hb = head_block or pick_head_block(N, 2 * D, W)
    assert N % hb == 0
    if not interpret:
        interpret = jax.default_backend() == "cpu"

    scalars = jnp.stack([jnp.asarray(layer_idx, jnp.int32),
                         jnp.asarray(index, jnp.int32)])
    col_spec = pl.BlockSpec((B, hb, D), lambda h, s: (0, h, 0))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // hb,),
        in_specs=[col_spec, col_spec, col_spec,
                  any_spec, any_spec, any_spec, any_spec],
        out_specs=[col_spec, any_spec, any_spec, any_spec, any_spec],
        scratch_shapes=[
            pltpu.VMEM((2, hb, D2, W), jnp.int8),  # kbuf
            pltpu.VMEM((2, hb, D2, W), jnp.int8),  # vbuf
            pltpu.VMEM((2, hb, W), jnp.float32),   # ksbuf
            pltpu.VMEM((2, hb, W), jnp.float32),   # vsbuf
            pltpu.VMEM((2, hb, D2, W), jnp.int8),  # kout (2-deep staging)
            pltpu.VMEM((2, hb, D2, W), jnp.int8),  # vout
            pltpu.VMEM((2, hb, W), jnp.float32),   # ksout
            pltpu.VMEM((2, hb, W), jnp.float32),   # vsout
            pltpu.SemaphoreType.DMA((2,)),         # ksem
            pltpu.SemaphoreType.DMA((2,)),         # vsem
            pltpu.SemaphoreType.DMA((2,)),         # kssem
            pltpu.SemaphoreType.DMA((2,)),         # vssem
            pltpu.SemaphoreType.DMA((2,)),         # kosem
            pltpu.SemaphoreType.DMA((2,)),         # vosem
            pltpu.SemaphoreType.DMA((2,)),         # ksosem
            pltpu.SemaphoreType.DMA((2,)),         # vsosem
        ],
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
        functools.partial(_decode_kernel4, scale=scale, hb=hb, batch=B),
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


# ------------------------------------------------------------------ #
# window-blocked cache scatter/gather (prefill path)
# ------------------------------------------------------------------ #


def scatter_columns(cache: jax.Array, cols: jax.Array,
                    layer_idx, index) -> jax.Array:
    """Write ``cols`` [B, N, Dc, S] into the window-blocked cache
    [L, B, NW, N, Dc, W] at absolute slots [index, index+S) of layer
    ``layer_idx`` — a read-modify-write of only the touched windows
    (prefill; decode steps write through the kernel instead)."""
    L, B, NW, N, Dc, W = cache.shape
    S = cols.shape[3]
    nt = min(NW, (S - 1) // W + 2)  # max windows a span of S can touch
    w0 = jnp.clip(jnp.asarray(index) // W, 0, NW - nt)
    win = lax.dynamic_slice(
        cache, (layer_idx, 0, w0, 0, 0, 0), (1, B, nt, N, Dc, W))[0]
    flat = win.transpose(0, 2, 3, 1, 4).reshape(B, N, Dc, nt * W)
    flat = lax.dynamic_update_slice(
        flat, cols.astype(cache.dtype), (0, 0, 0, index - w0 * W))
    back = flat.reshape(B, N, Dc, nt, W).transpose(0, 3, 1, 2, 4)
    return lax.dynamic_update_slice(
        cache, back[None], (layer_idx, 0, w0, 0, 0, 0))


def scatter_scale_columns(scales: jax.Array, scols: jax.Array,
                          layer_idx, index) -> jax.Array:
    """Same for the [L, B, NW, N, W] scale array; scols [B, N, S]."""
    L, B, NW, N, W = scales.shape
    S = scols.shape[2]
    nt = min(NW, (S - 1) // W + 2)
    w0 = jnp.clip(jnp.asarray(index) // W, 0, NW - nt)
    win = lax.dynamic_slice(
        scales, (layer_idx, 0, w0, 0, 0), (1, B, nt, N, W))[0]
    flat = win.transpose(0, 2, 1, 3).reshape(B, N, nt * W)
    flat = lax.dynamic_update_slice(
        flat, scols.astype(scales.dtype), (0, 0, index - w0 * W))
    back = flat.reshape(B, N, nt, W).transpose(0, 2, 1, 3)
    return lax.dynamic_update_slice(
        scales, back[None], (layer_idx, 0, w0, 0, 0))


def gather_layer(cache: jax.Array, layer_idx) -> jax.Array:
    """Blocked cache [L, B, NW, N, Dc, W] -> layer ``layer_idx`` as
    column-form [B, N, Dc, NW*W] (prefill dense attention path)."""
    L, B, NW, N, Dc, W = cache.shape
    win = lax.dynamic_slice(
        cache, (layer_idx, 0, 0, 0, 0, 0), (1, B, NW, N, Dc, W))[0]
    return win.transpose(0, 2, 3, 1, 4).reshape(B, N, Dc, NW * W)


def gather_scales(scales: jax.Array, layer_idx) -> jax.Array:
    """[L, B, NW, N, W] -> [B, N, NW*W] for layer ``layer_idx``."""
    L, B, NW, N, W = scales.shape
    win = lax.dynamic_slice(
        scales, (layer_idx, 0, 0, 0, 0), (1, B, NW, N, W))[0]
    return win.transpose(0, 2, 1, 3).reshape(B, N, NW * W)


def blocked_from_columns(col: jax.Array) -> jax.Array:
    """Column-form [L, B, N, Dc, T] -> window-blocked [L, B, NW, N, Dc, W]
    (T must be a WRITE_WINDOW multiple).  Scale arrays [L, B, N, T] map to
    [L, B, NW, N, W] the same way.  Test/tooling helper."""
    W = WRITE_WINDOW
    if col.ndim == 5:
        L, B, N, Dc, T = col.shape
        return col.reshape(L, B, N, Dc, T // W, W).transpose(0, 1, 4, 2, 3, 5)
    L, B, N, T = col.shape
    return col.reshape(L, B, N, T // W, W).transpose(0, 1, 3, 2, 4)


def columns_from_blocked(blk: jax.Array) -> jax.Array:
    """Inverse of :func:`blocked_from_columns`."""
    if blk.ndim == 6:
        L, B, NW, N, Dc, W = blk.shape
        return blk.transpose(0, 1, 3, 4, 2, 5).reshape(L, B, N, Dc, NW * W)
    L, B, NW, N, W = blk.shape
    return blk.transpose(0, 1, 3, 2, 4).reshape(L, B, N, NW * W)


def quantize_kv(cols: jax.Array, num_heads: int) -> tuple[jax.Array, jax.Array]:
    """Per-(head, token) absmax int8 quantization of K or V columns
    (prefill path; the decode loop quantizes in-kernel).

    cols: [B, H, S] -> (int8 [B, N, D, S], scales f32 [B, N, S]) in
    column form; ``scatter_columns`` folds these into the blocked cache.
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
