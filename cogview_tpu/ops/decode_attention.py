"""Fused single-token decode attention over a quantized KV cache — Pallas.

The hot loop of image generation is a 1024-step autoregressive decode whose
per-step cost is pure HBM bandwidth: every step must stream the model
weights plus the whole KV cache.  Four design decisions push this to the
roofline on TPU (each was measured as a distinct multi-ms/step cost at
cogview-base scale on v5e before being designed out):

* the cache is stored **int8** with per-(head, token) scales — half the
  bf16 bytes, so a 16-image batch streams the same cache bytes as an
  8-image bf16 batch;
* dequantize + QK^T + mask + softmax + scale + PV run in **one kernel**,
  upcasting int8 tiles in VMEM.  Left to XLA, the s8->f32 convert of the
  cache is materialized in HBM at batch >= 16 (measured: 269 us per layer
  per tensor — 26 ms/step of pure dequant traffic);
* cache updates are **deferred and batched** (the r4 "seal group"): the
  last ``SEAL_GROUP``-1 tokens' exact K/V live in a small ring buffer
  (``recent``, [L, G, B, N, 2*D] f32, ~315MB at base/B40)
  that the kernel attends EXACTLY via an unrolled epilogue, and the int8
  window write-back happens only on every G-th step, inserting the whole
  group at once.  The previous design (write the live window back every
  step through input_output_aliases) was measured at **5.03 ms/step of
  pure write-back cost** (B40, 1 live window: 7.51 -> 2.47 ms/step with
  the write-back deleted) — the RMW select + 2 extra DMAs per row block
  starved the read stream (638 -> 757 GB/s) and dominated the per-call
  fixed cost.  Deferring to every 8th step keeps the same average VPU
  select work but cuts the write DMA traffic and its read-stream
  contention 8x, and the ring tokens attend EXACTLY (bf16 columns
  embedded losslessly in the f32 ring — better than the old
  current-token-only exactness);
* as before, the grid streams only the SEALED windows
  (``ceil(c0 / 128)`` of NW, c0 = index - index % G), so a 1024-token
  decode reads ~5.5 of 9 windows on average.

Cache layout is **window-blocked and K/V-fused**:
data ``[L, NW, B, 2, N, Dc, W]`` int8 and scales ``[L, NW, B, 2, N, W]``
f32, with NW = ceil(T / 128) windows of W = 128 tokens and the ``2`` dim
holding K at 0 / V at 1.  Three properties are load-bearing:

* (Dc, W) as the trailing dims keeps the s8 tiles pad-free ((32, 128)
  tiles; a [.., W, D=64] order would pad 64 lanes to 128 and DOUBLE the
  footprint — measured in r2).  The RING obeys the same law by fusing
  K|V into the lane dim: [.., N, 2*D] puts exactly 128 lanes minor and
  an f32-sublane-aligned N second-minor, so the manual head-slice DMA
  is tile-aligned (the r4 [.., 2, N, D] layout lane-padded D=64 to 128
  — same HBM bytes — and Mosaic rejected the 64-wide slice outright:
  "Slice shape along dimension 5 must be aligned to tiling (128)").
  f32 (not compute dtype) because bf16's (16, 128) tile does not
  divide N=40; bf16 values embed exactly in f32, so the ring stays
  exact and its HBM traffic equals the padded-bf16 layout's;
* the WINDOW index is a MAJOR dim (ahead of batch), so one loop
  iteration's fetch ``[rb, 2, hb, Dc, W]`` — a ROW BLOCK of rb batch
  rows, K AND V together — is a single contiguous ~1.3MB HBM run at
  full head count.  Windowing the minor dim instead makes every window
  DMA a strided gather of 128-byte rows (~70 GB/s vs ~600 contiguous,
  measured r3);
* K and V (and both scale tensors) share ONE array, so each iteration
  issues 2 DMAs instead of 4 (the 4-DMA kernel paid a ~5 ms/step
  issue/wait intercept, measured r4).

Both kernel matmuls are direct batched GEMMs over the fused (row, head)
lanes with no in-kernel transposes (a VPU mul+reduce contraction was
measured 1.6x SLOWER than the batched MXU matvecs at base scale); the
stacked L dim keeps the model's ``lax.scan`` over layers carrying one
buffer, with the *current layer* selected by a scalar-prefetch argument
feeding the manual DMA slices, i.e. the DMA engine reads layer ``li``'s
blocks straight from HBM (an XLA dynamic-slice of a scan carry would be
a whole-layer HBM copy).

Masking matches ops/attention.decode_mask: sealed slot kpos is visible iff
kpos < c0; ring slot g is visible iff g <= index % G (ring position
c0 + g); invisible logits are -10000 exactly (reference
mpu/sparse_transformer.py:662-663 — they underflow to probability 0 after
the f32 max subtraction).  Numerics: sealed tokens are int8-rounded
exactly as before (the seal quantizes the same bf16 columns the old
per-step path did); the last <= G tokens are EXACT.  Measured against
the r3 per-step-write kernel (scripts/kv_quality_check.py, r5): a wash —
KL vs the bf16 cache identical (2.3e-5 nats), sampled-token flips
better (0.20% vs 0.29%), argmax flips slightly worse (1.17% vs 0.88%).

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
WRITE_WINDOW = 128  # token window written back per seal (lane-aligned)
SEAL_GROUP = 8  # decode steps per cache write-back; last <=8 tokens ride
#                 the exact ring buffer (W % SEAL_GROUP == 0 required)


def pad_cache_len(max_len: int) -> int:
    """Cache T is allocated in WRITE_WINDOW multiples so the seal window
    never crosses the array edge.  Padded slots are never visible
    (kpos < c0 masking)."""
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
    ceiling is VMEM: fused in-buffers + 2-deep seal staging + the f32
    compute transients are ~7MB per row at (hb=40, D=64, W=128), so rb=2
    (~14MB peak, under the 64MB scoped limit with the ring block) is the
    sweet spot; rb=4 measured within 1% of rb=2.  Odd batches fall back
    to 1."""
    per_row = 2 * head_block * head_dim * WRITE_WINDOW  # K+V int8 window
    for rb in (2, 1):
        if batch % rb == 0 and rb * per_row * 9 <= 12 * 1024 * 1024:
            # 9 ~= 2x(in kv int8) + 2x(out kv int8) + 2x(f32 compute
            # converts) + seal transients, in int8-window units
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


def _decode_kernel(s_ref, q_ref, rec_hbm, kv_hbm, s_hbm,
                   o_ref, kvo_hbm, so_hbm,
                   buf, sbuf, rbuf, obuf, osbuf,
                   dsem, ssem, rsem, osem, sosem,
                   *, scale, hb, batch, rb, packed, G):
    """One head-block grid cell runs ALL batch rows: a single manual
    double-buffered DMA loop over the flattened (row block, sealed window)
    sequence, so the pipeline never drains between rows.

    s_ref (SMEM): [layer, index]; q [B,hb,D] VMEM block; the cache stays
    in HBM (memory_space=ANY) and the kernel streams exactly
    ``swl = max(ceil(c0/W), 1)`` fused [rb,2,hb,Dc,W] K+V window blocks
    (plus [rb,2,hb,W] scale blocks) per ROW BLOCK of ``rb`` batch rows
    through 2-slot VMEM buffers — iteration i+2's copy is issued right
    after i's compute, crossing row-block boundaries.  The whole ring
    buffer slice for this layer/head-block ([G,B,hb,2D] K|V lane-fused) is fetched once
    at kernel start and waited at the first epilogue, overlapping the
    first window's streaming.

    Per row block the epilogue merges the ring tokens (exact, unrolled
    over G static slots, masked by g <= index % G) into the flash
    accumulators and writes the context.  On SEAL steps
    (index % G == G-1) it additionally quantizes the G ring columns and
    writes window ``c0 // W`` back with lanes [c0 % W, c0 % W + G)
    replaced — from the resident streamed window, or from zeros when c0
    lands on a window boundary (the target window then holds no sealed
    columns yet).  Write-back goes out as 2 DMAs staged 2-deep so the
    wait is deferred two row blocks; all write waits are predicated on
    the seal step so non-seal calls leave the cache untouched (the
    aliased output buffers keep their input bytes).

    ``packed`` switches the compute to int4 nibble-packed blocks
    (Dc = D/2, per-element [-7,7], module ``_unpack4`` note); the DMA
    machinery is identical and the ring stays exact."""
    li = s_ref[0]
    index = s_ref[1]
    h = pl.program_id(0)
    W = WRITE_WINDOW
    rem = lax.rem(index, G)
    c0 = index - rem  # sealed prefix length
    is_seal = rem == G - 1
    twin = c0 // W  # seal target window
    lane0 = c0 - twin * W
    swl = lax.max(lax.div(c0 + W - 1, W), 1)  # streamed (sealed) windows
    n_rb = batch // rb
    total = n_rb * swl
    hs = h * hb
    D = q_ref.shape[2]
    D2 = D // 2
    RH = rb * hb  # fused (row, head) lane count per iteration

    def coords(it):
        r = it // swl
        return r, it - r * swl

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

    rcopy = pltpu.make_async_copy(
        rec_hbm.at[li, :, :, pl.ds(hs, hb)], rbuf, rsem)

    def out_copies(r, oslot):
        b0 = r * rb
        return (
            pltpu.make_async_copy(
                obuf.at[oslot],
                kvo_hbm.at[li, twin, pl.ds(b0, rb), pl.ds(0, 2),
                           pl.ds(hs, hb)],
                osem.at[oslot]),
            pltpu.make_async_copy(
                osbuf.at[oslot],
                so_hbm.at[li, twin, pl.ds(b0, rb), pl.ds(0, 2),
                          pl.ds(hs, hb)],
                sosem.at[oslot]),
        )

    def wait_out(oslot):
        for c in out_copies(0, oslot):
            c.wait()

    rcopy.start()
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
        s = jnp.where(kpos < c0, s, MASK_VALUE)
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

        @pl.when(w == swl - 1)
        def _epilogue():
            # the ring fetch was issued at kernel start; the first
            # epilogue waits it (overlapped by >= 1 window's streaming)
            @pl.when(r == 0)
            def _():
                rcopy.wait()

            # ---- exact ring attention: slots g = 0..G-1 are positions
            # c0 + g, valid while g <= rem, merged into the flash state in
            # ONE vectorized pass over the G dim (local merge — the
            # streaming carry stays untouched for the next row block).
            # The r4 kernel unrolled G serial online-softmax updates here;
            # the 8-deep exp/mul dependency chain x n_rb row blocks was
            # ~60% of the kernel's measured 134us per-call fixed cost
            # (scripts/decode_kernel_microbench.py, r5) ----
            kv_all = rbuf[:, pl.ds(b0, rb)].reshape(G, RH, 2 * D)
            kall = lax.slice_in_dim(kv_all, 0, D, axis=2)  # [G, RH, D]
            vall = lax.slice_in_dim(kv_all, D, 2 * D, axis=2)
            sg = jnp.sum(q[None, :, :] * kall, axis=2)  # [G, RH]
            gi = lax.broadcasted_iota(jnp.int32, (G, RH), 0)
            sg = jnp.where(gi <= rem, sg, -1e30)
            m2 = jnp.maximum(m_new, jnp.max(sg, axis=0))  # [RH]
            a2 = jnp.exp(m_new - m2)
            p = jnp.exp(sg - m2[None, :])  # [G, RH]
            l_e = l * a2 + jnp.sum(p, axis=0)
            pv = jnp.sum(p[:, :, None] * vall, axis=0)  # [RH, D]
            acc_e = acc * a2[:, None] + pv
            o_ref[pl.ds(b0, rb)] = (
                acc_e / l_e[:, None]).reshape(rb, hb, D).astype(o_ref.dtype)

            # ---- seal: quantize the G ring columns and write window
            # ``twin`` with lanes [lane0, lane0+G) replaced.  All G
            # columns quantize in one vectorized pass over (G, K|V), then
            # land in their window lanes via ONE one-hot MXU matmul per
            # row (contract over G; qc values are integers <= 255, exact
            # in f32) + one masked select per (row, K/V).  The lhs rides
            # the ring's native [G, hb, 2D] fused layout collapsed to
            # [G, hb*2D] — minor stays 128 so the shape cast is legal (a
            # [G, hb, D]x[G, W] 3-free-dim dot is NOT: Mosaic tries a
            # 64-lane-minor collapse and aborts; scripts/
            # seal_scatter_probe.py).  The r4 kernel's G-deep serial
            # where-chain here cost 34 ms per seal STEP at base/B40
            # (attn 44.9 vs 10.8 ms/step at idx 575 vs 576, scripts/
            # decode_phase_microbench.py) = 4.3 ms/step amortized ----
            @pl.when(is_seal)
            def _seal():
                oslot = lax.rem(r, 2)

                @pl.when(r >= 2)
                def _():
                    wait_out(oslot)

                Dc = D2 if packed else D
                qmax = 7.0 if packed else 127.0
                lane_i3 = lax.broadcasted_iota(jnp.int32, (hb, Dc, W), 2)
                lane_i2 = lax.broadcasted_iota(jnp.int32, (hb, W), 1)
                grp3 = (lane_i3 >= lane0) & (lane_i3 < lane0 + G)
                grp2 = (lane_i2 >= lane0) & (lane_i2 < lane0 + G)
                # onehot[g, l] = 1.0 iff l == lane0 + g  (f32 for the MXU)
                onehot = (
                    lax.broadcasted_iota(jnp.int32, (G, W), 1)
                    == lane0 + lax.broadcasted_iota(jnp.int32, (G, W), 0)
                ).astype(jnp.float32)
                for j in range(rb):
                    kv_j = rbuf[:, pl.ds(b0 + j, 1)].reshape(G, hb, 2 * D)
                    kcol = lax.slice_in_dim(kv_j, 0, D, axis=2)
                    vcol = lax.slice_in_dim(kv_j, D, 2 * D, axis=2)
                    sck = jnp.maximum(
                        jnp.max(jnp.abs(kcol), axis=2), 1e-8) / qmax
                    scv = jnp.maximum(
                        jnp.max(jnp.abs(vcol), axis=2), 1e-8) / qmax
                    qk = jnp.round(kcol / sck[:, :, None])  # [G, hb, D]
                    qv = jnp.round(vcol / scv[:, :, None])
                    if packed:
                        qk = jnp.clip(qk, -7.0, 7.0)
                        qv = jnp.clip(qv, -7.0, 7.0)
                    qkv = jnp.concatenate([qk, qv], axis=2)  # [G, hb, 2D]
                    qW = lax.dot_general(
                        qkv.reshape(G, hb * 2 * D), onehot,
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).reshape(hb, 2 * D, W)
                    for t in (0, 1):
                        # base = the RESIDENT window.  When c0 sits on a
                        # window boundary the target window was not
                        # streamed and the resident bytes are the
                        # PREVIOUS window's — harmless: every non-group
                        # lane of the target is a position >= c0 + G,
                        # invisible until a later seal overwrites it.
                        win8 = lax.index_in_dim(
                            lax.index_in_dim(kvb, j, 0, keepdims=False),
                            t, 0, keepdims=False)  # [hb, Dc, W]
                        swin = lax.index_in_dim(
                            lax.index_in_dim(scb, j, 0, keepdims=False),
                            t, 0, keepdims=False)  # [hb, W]
                        qt = lax.slice_in_dim(
                            qW, t * D, (t + 1) * D, axis=1)  # [hb, D, W]
                        if packed:
                            # pack AFTER the scatter: non-group lanes
                            # become the constant 8, masked off by grp3
                            hi = lax.slice_in_dim(qt, 0, D2, axis=1)
                            lo = lax.slice_in_dim(qt, D2, D, axis=1)
                            qt = 16.0 * hi + (lo + 8.0)  # [hb, D2, W]
                        scW = lax.dot_general(
                            sck if t == 0 else scv, onehot,
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        obuf[oslot, j, t] = jnp.where(
                            grp3, qt.astype(jnp.int8), win8)
                        osbuf[oslot, j, t] = jnp.where(grp2, scW, swin)
                for c in out_copies(r, oslot):
                    c.start()

        # issue i+2's prefetch only AFTER the epilogue: it reuses this
        # slot, and the seal still reads the resident window (buf/sbuf
        # [slot]) to stage the write-back — starting the copy earlier
        # races the overwrite against those reads
        @pl.when(it + 2 < total)
        def _():
            start(it + 2, slot)

        return m_new, l, acc

    m0 = jnp.full((RH,), -1e30, jnp.float32)
    l0 = jnp.zeros((RH,), jnp.float32)
    acc0 = jnp.zeros((RH, D), jnp.float32)
    lax.fori_loop(0, total, body, (m0, l0, acc0))

    # drain the last (up to two) staged write-backs — seal steps only
    # (waiting an unsignaled semaphore would deadlock)
    @pl.when(is_seal)
    def _():
        if n_rb >= 2:
            wait_out((n_rb - 2) % 2)
        wait_out((n_rb - 1) % 2)


def _shard_over_batch(fn, data_axis, model_axis, q, recent, kv, s,
                      layer_idx, index):
    """Run the quantized-decode kernel per mesh shard: batch dims sharded
    over ``data_axis`` (cache dim 2, ring dim 2, q dim 0), HEAD dims over
    ``model_axis`` (cache dim 4, ring dim 3 — the fused [L,G,B,N,2D]
    layout's N, q dim 1; the window dim 1 stays unsharded), scalars
    replicated.  Attention is (batch row,
    head)-local, so the kernel needs no cross-shard collectives either
    way.  Uses the ambient mesh (jax.set_mesh)."""
    P_ = jax.sharding.PartitionSpec
    col = P_(data_axis, model_axis)
    cache = P_(None, None, data_axis, None, model_axis)
    ring = P_(None, None, data_axis, model_axis, None)
    rep = P_()
    return jax.shard_map(
        fn,
        in_specs=(col, ring, cache, cache, rep, rep),
        out_specs=(col, cache, cache),
        # pallas_call out_shapes carry no varying-mesh-axes metadata; the
        # kernel is per-shard pure so the vma check has nothing to verify
        check_vma=False,
    )(q, recent, kv, s, layer_idx, index)


def decode_attention_quant(
    q: jax.Array,  # [B, N, D] current token's queries (compute dtype)
    recent: jax.Array,  # [L, G, B, N, 2*D] exact K|V-fused ring (f32)
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

    ``recent`` slot g must hold the exact K/V column of absolute position
    c0 + g (c0 = index - index % G) for every g <= index % G — including
    the CURRENT token at g = index % G (the caller writes it before the
    call; gpt._layer_body does).  Ring layout is K|V fused in the lane
    dim ([L, G, B, N, 2*D] f32, K at [0, D)) — see the module notes on
    tile alignment; :func:`fuse_ring` converts the split test layout.  The cache arrays are donated
    (input_output_aliases); on seal steps (index % G == G-1) layer
    ``layer_idx`` gets window c0 // W updated with the quantized group,
    on other steps they pass through untouched.  ``Dc == D`` selects the
    int8 kernel, ``Dc == D/2`` the packed-int4 one (same DMA machinery,
    see module notes).  Falls back to interpret mode on CPU.
    ``data_axis``/``model_axis`` run the kernel per shard of an ambient
    mesh — batch rows over data, heads over model (multi-chip DP/TP
    decode over the quantized cache; attention is (row, head)-local so no
    collectives).  ``row_block`` batch rows are processed per DMA-loop
    iteration (default: the largest of 2/1 that divides B and fits the
    VMEM budget)."""
    if data_axis is not None or model_axis is not None:
        fn = functools.partial(decode_attention_quant,
                               head_block=head_block, row_block=row_block,
                               interpret=interpret)
        return _shard_over_batch(fn, data_axis, model_axis, q, recent,
                                 kv8, kvscale, layer_idx, index)
    B, N, D = q.shape
    L, nw, _, _, _, Dc, W = kv8.shape
    G = recent.shape[1]
    packed = Dc == D // 2 and Dc != D
    assert W == WRITE_WINDOW and kv8.shape == (L, nw, B, 2, N, Dc, W), kv8.shape
    assert packed or Dc == D, (Dc, D)
    assert kvscale.shape == (L, nw, B, 2, N, W), kvscale.shape
    assert recent.shape == (L, G, B, N, 2 * D), recent.shape
    assert recent.dtype == jnp.float32, recent.dtype
    assert W % G == 0, (W, G)
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
        in_specs=[col_spec, any_spec, any_spec, any_spec],
        out_specs=[col_spec, any_spec, any_spec],
        scratch_shapes=[
            pltpu.VMEM((2, rb, 2, hb, Dc, W), jnp.int8),   # buf (K+V in)
            pltpu.VMEM((2, rb, 2, hb, W), jnp.float32),    # sbuf (scales in)
            pltpu.VMEM((G, B, hb, 2 * D), jnp.float32),    # rbuf (ring)
            pltpu.VMEM((2, rb, 2, hb, Dc, W), jnp.int8),   # obuf (2-deep out)
            pltpu.VMEM((2, rb, 2, hb, W), jnp.float32),    # osbuf
            pltpu.SemaphoreType.DMA((2,)),                 # dsem
            pltpu.SemaphoreType.DMA((2,)),                 # ssem
            pltpu.SemaphoreType.DMA,                       # rsem
            pltpu.SemaphoreType.DMA((2,)),                 # osem
            pltpu.SemaphoreType.DMA((2,)),                 # sosem
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((B, N, D), q.dtype),
        jax.ShapeDtypeStruct(kv8.shape, jnp.int8),
        jax.ShapeDtypeStruct(kvscale.shape, jnp.float32),
    ]
    # tensor input i (scalar-prefetch arg = 0) aliases output slot:
    # kv8 -> 1, kvscale -> 2 (recent is read-only)
    aliases = {3: 1, 4: 2}
    kw = {}
    if not interpret:
        # the ring block ([G,B,hb,2D] f32, lanes exactly 128) pushes past the
        # default 16MB scoped budget at base/B40; v5e has 128MB VMEM.
        # Budget the actual scratch: 4 window buffers (in/out x 2 slots)
        # + ring + compute transients (measured ~12x the window block at
        # rb 8/10: Mosaic stack-allocates the f32/bf16 converts and the
        # unrolled seal temporaries), floor 64MB.
        win_bytes = rb * 2 * hb * Dc * W
        scr = 4 * win_bytes + G * B * hb * 2 * D * 4 + 12 * rb * hb * D * W
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=max(64 * 1024 * 1024,
                                 min(scr + 16 * 1024 * 1024,
                                     120 * 1024 * 1024)))
    ctx, kv8, kvscale = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale, hb=hb, batch=B, rb=rb,
                          packed=packed, G=G),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
        **kw,
    )(scalars, q, recent, kv8, kvscale)
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
    (prefill; decode steps seal through the kernel instead)."""
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


def fuse_ring(ring_split: jax.Array) -> jax.Array:
    """Split ring layout [L, G, B, 2, N, D] (K at 0 / V at 1) -> the
    kernel's K|V lane-fused f32 ring [L, G, B, N, 2*D] (test/tool helper;
    the model writes fused columns directly)."""
    r = jnp.asarray(ring_split)
    return jnp.concatenate(
        [r[:, :, :, 0], r[:, :, :, 1]], axis=-1).astype(jnp.float32)


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
    (prefill path; decode seals quantize in-kernel).

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
