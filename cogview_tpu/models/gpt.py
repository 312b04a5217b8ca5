"""CogView GPT: decoder-only transformer with Sandwich-LayerNorm.

Functional re-design of the reference model (model/gpt2_modeling.py:55 +
mpu/sparse_transformer.py:237-626) for TPU:

* layers are stacked into [L, ...] arrays and executed with ``lax.scan``
  (one compiled layer body regardless of depth, ``jax.checkpoint`` for
  activation rematerialization);
* tensor parallelism is sharding metadata (see parallel/sharding.py), not
  code — the qkv/mlp matmuls carry a 'model'-sharded output/input dim and
  pjit inserts the all-reduces the reference wrote by hand in mpu/;
* autoregressive decoding uses a true KV cache.  The reference caches
  layer *inputs* ("mems", sparse_transformer.py:130-141) and re-projects
  the whole prefix every step; K/V are per-token affine images of LN(h),
  so caching K/V is mathematically equivalent (exactly so with
  pb_relax=False; with the PB-relax prescale both the reference's mems
  path and this cache differ from a monolithic forward only through the
  per-block eps correction, O(eps/sigma^2)) and removes the O(S)
  recompute per generated token.

Architecture per layer (sparse_transformer.py:314-341, Sandwich-LN):
  h  = h + LN3(drop(Wo @ attn(LN1(h))))
  h  = h + LN4(drop(W2 @ gelu(W1 @ LN2(h))))
with a final LayerNorm and logits tied to the word embedding.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import GPTConfig
from ..ops.attention import causal_mask, decode_mask, dense_attention, dense_attention_kvT
from ..ops.precision import dot_precision
from ..ops.layernorm import layer_norm
from ..ops.decode_attention import (
    decode_attention_quant, dequantize_kv, dequantize_kv4, gather_kv,
    gather_kv_scales, pad_cache_len, quantize_kv, quantize_kv4,
    scatter_kv_columns, scatter_kv_scales)
from ..ops.flash_attention import flash_attention
from ..ops.hash_prng import hash_dropout, seed_from_key
from ..ops.sparse_attention import pivot_window_attention


class SparseSpec(NamedTuple):
    """Pivot+window sparse attention inputs (ops/sparse_attention.py)."""

    pivot_idx: jax.Array  # [B, P]
    pivot_mask: jax.Array  # [B, S, P]
    query_window: int
    key_window_times: int

Params = Dict[str, Any]


# --------------------------------------------------------------------- #
# init
# --------------------------------------------------------------------- #


def init_params(key: jax.Array, cfg: GPTConfig, dtype=jnp.float32) -> Params:
    H, L, V, P = cfg.hidden_size, cfg.num_layers, cfg.vocab_size, cfg.max_position_embeddings
    ks = jax.random.split(key, 8)
    std = cfg.init_std
    out_std = std / math.sqrt(2.0 * L) if cfg.scaled_output_init else std

    def nrm(k, shape, s):
        # generate directly in the target dtype: at 4B params the fp32
        # transients of a generate-then-cast would double peak HBM
        return jnp.asarray(s, dtype) * jax.random.normal(k, shape, dtype)

    def ln(shape=(L, H)):
        return {"g": jnp.ones(shape, dtype), "b": jnp.zeros(shape, dtype)}

    params = {
        "embed": {
            "word": nrm(ks[0], (V, H), std),
            "pos": nrm(ks[1], (P, H), std),
        },
        "layers": {
            "ln_in": ln(),
            "qkv": {"w": nrm(ks[2], (L, H, 3, H), std), "b": jnp.zeros((L, 3, H), dtype)},
            "attn_out": {"w": nrm(ks[3], (L, H, H), out_std), "b": jnp.zeros((L, H), dtype)},
            "ln_attn": ln(),
            "ln_post": ln(),
            "mlp_in": {"w": nrm(ks[4], (L, H, 4 * H), std), "b": jnp.zeros((L, 4 * H), dtype)},
            "mlp_out": {"w": nrm(ks[5], (L, 4 * H, H), out_std), "b": jnp.zeros((L, H), dtype)},
            "ln_mlp": ln(),
        },
        "ln_final": {"g": jnp.ones((H,), dtype), "b": jnp.zeros((H,), dtype)},
    }
    return params


def quantize_weights(params: Params) -> Params:
    """Weight-only symmetric per-output-channel int8 quantization of the
    big matmul weights (qkv / attn_out / mlp_in / mlp_out / tied word
    embedding) for the memory-bound decode path.

    Decode streams every weight byte per generated token, so int8 halves
    the dominant HBM term (cogview-base: 7.86 GB bf16 -> 3.96 GB + 0.12 GB
    scales).  Per-OUTPUT-channel scales make dequantization exact on the
    matmul output: x @ W == (x @ W_q) * s  with  W = W_q * s[None, :], so
    the only error is the rounding of W (the einsum runs on the int8
    weights converted to compute dtype in-dot; the f32 per-channel scale
    multiplies the [B,S,O] activations, never a weight-sized tensor).
    Biases, LayerNorms and the position table stay in their stored dtype.

    Quantized leaves swap {"w": W} for {"w8": int8, "s": f32 scale};
    the forward dispatches on the key (static pytree structure).  The
    tied embedding keeps both roles: logits use (h @ w8^T) * s[v], the
    input gather dequantizes the taken rows only."""

    def q(w, caxis):
        w = jnp.asarray(w, jnp.float32)
        amax = jnp.max(jnp.abs(w), axis=caxis, keepdims=True)
        s = jnp.maximum(amax, 1e-12) / 127.0
        w8 = jnp.round(w / s).astype(jnp.int8)
        return {"w8": w8, "s": jnp.squeeze(s, axis=caxis)}

    lyr = params["layers"]
    out = {
        "embed": {
            # word [V, H]: logits contract over H -> per-vocab-row scale
            "word": q(params["embed"]["word"], 1),
            "pos": params["embed"]["pos"],
        },
        "layers": {
            "ln_in": lyr["ln_in"],
            "qkv": {**q(lyr["qkv"]["w"], 1), "b": lyr["qkv"]["b"]},  # [L,H,3,H] c-axis H
            "attn_out": {**q(lyr["attn_out"]["w"], 1), "b": lyr["attn_out"]["b"]},
            "ln_attn": lyr["ln_attn"],
            "ln_post": lyr["ln_post"],
            "mlp_in": {**q(lyr["mlp_in"]["w"], 1), "b": lyr["mlp_in"]["b"]},
            "mlp_out": {**q(lyr["mlp_out"]["w"], 1), "b": lyr["mlp_out"]["b"]},
            "ln_mlp": lyr["ln_mlp"],
        },
        "ln_final": params["ln_final"],
    }
    return out


def _wmul(x, leaf, subscripts, cdt, out32=True):
    """einsum against a weight leaf that is either {"w"} (stored dtype) or
    {"w8","s"} (int8 + per-output-channel scale; see quantize_weights).
    Returns f32 (bias not yet added) unless ``out32=False``.

    ``out32=False`` (the transformer-layer matmuls in low-precision
    compute) emits the dot in the operand dtype: the MXU still
    accumulates f32 internally, so the only forward change is one
    bf16 rounding of y before the f32 bias add — but the BACKWARD
    cotangent then stays bf16 through the dW/dx transpose dots instead
    of being upcast f32 by the output cast's transpose (mixed
    f32xbf16 MXU passes).  Measured: tutorial grad 369 -> 349 ms/step
    (scripts/train_phase_microbench.py, r5).  Logits/CE callers keep
    the f32 output, as does fp16 compute (a f16-rounded dot output can
    overflow f16's range where the f32 one would not — bf16 shares
    f32's exponent, so it cannot)."""
    if "w8" in leaf:
        y = jnp.einsum(subscripts, x, leaf["w8"].astype(cdt),
                       preferred_element_type=jnp.float32,
                       precision=dot_precision(x))
        return y * leaf["s"]  # [..., O] f32 row scales broadcast
    want32 = out32 or x.dtype != jnp.bfloat16
    return jnp.einsum(subscripts, x, leaf["w"].astype(cdt),
                      preferred_element_type=(jnp.float32 if want32
                                              else None),
                      precision=dot_precision(x))


def extend_position_embedding(weight: jax.Array, length: int) -> jax.Array:
    """Grow a position-embedding table [P, H] to [length, H] by tiling it
    (reference utils.py:283-287 — ``expand(length//P).reshape``).  The
    reference asserts divisibility; for the 1089 -> 1345 SR extension
    the tail is the tiling truncated to length (rows P..length-1 reuse
    rows 0..length-P-1), which generalizes the same scheme.
    """
    P = weight.shape[0]
    if length <= P:
        return weight[:length]
    reps = -(-length // P)
    return jnp.concatenate([weight] * reps, axis=0)[:length]


def adapt_position_embeddings(params: Params, cfg: GPTConfig) -> Params:
    """Fit loaded params to ``cfg.max_position_embeddings``: extend a
    shorter table (1089-pos base checkpoint into the 1345-pos SR preset,
    scripts/super_resolution.sh:8) or truncate a longer one.  No-op when
    the lengths already match."""
    pos = params["embed"]["pos"]
    target = cfg.max_position_embeddings
    if pos.shape[0] == target:
        return params
    new_pos = extend_position_embedding(jnp.asarray(pos), target)
    return {
        **params,
        "embed": {**params["embed"], "pos": new_pos.astype(pos.dtype)},
    }


# --------------------------------------------------------------------- #
# KV cache
# --------------------------------------------------------------------- #


class KVCache(NamedTuple):
    """K/V stored TRANSPOSED: [L, B, H, T].

    Layout rules (measured at cogview-base scale):
    * the head split must not be materialized — [.., N, D] with D=64 pads
      to 128 lanes and doubles the footprint; H=2560 stays lane-aligned;
    * T minor matches the layout XLA assigns the in-loop attention
      matmuls (it otherwise rewrites the cache into this layout itself,
      via layout-change copies at batch >= 10).  Note XLA's while-loop
      buffer compression still keeps ~2x one cache of headroom at the
      prefill/loop boundary, which caps batch at 8 on a 16GB chip —
      ``kv_cache_dtype="int8"`` (QuantKVCache) halves that and lifts the
      decode batch to 16+.
    """

    k: jax.Array  # [L, B, H, T]
    v: jax.Array  # [L, B, H, T]

    @property
    def max_len(self) -> int:
        return self.k.shape[3]


class QuantKVCache(NamedTuple):
    """int8 KV cache + per-(head, token) scales (cfg.kv_cache_dtype="int8").

    Layout is **window-blocked and K/V-fused**: data [L, NW, B, 2, N, Dc,
    W] with NW 128-token windows and K/V stacked on the ``2`` dim (scales
    [L, NW, B, 2, N, W]; see ops/decode_attention.py).  The window-major
    order makes each (row-block, window) fetch one contiguous HBM run so
    the decode kernel streams only the SEALED windows at full bandwidth;
    K/V fusion halves the DMA descriptor count (a measured per-step
    bottleneck at base scale); (Dc, W) trailing keeps s8 tiles pad-free.

    ``recent`` is the exact ring of the last SEAL_GROUP tokens' K/V
    columns ([L, G, B, N, 2*D] f32, K in lanes [0, D) / V in [D, 2*D)):
    decode steps append the current column here (a contiguous
    dynamic_update_slice — no int8-tile churn) and the Pallas kernel
    attends it exactly, writing a whole quantized group into its cache
    window only every G-th step.  Per-step cache write-back was measured
    at 5 ms/step at base/B40 (ops/decode_attention.py module notes).
    The K|V lane fusion makes the ring's minor dim exactly 128 and f32
    keeps its sliced dims sublane-aligned — the split [.., 2, N, D]
    layout lane-pads D=64 to 128 (same HBM bytes) and fails Mosaic's
    slice-alignment check on real TPU (the r4 BENCH regression).

    Sequencing contract: all Q>1 prefill chunks must PRECEDE the first
    S==1 decode step.  After G-unaligned decode steps, positions
    [c0, index) exist only in the ring (their cache windows are
    unsealed); a later Q>1 chunk would attend the dequantized cache over
    garbage slots and its ring refill can evict the unsealed columns —
    silent corruption.  No in-repo caller interleaves decode->prefill;
    forward_with_cache documents the same restriction."""

    kv: jax.Array  # [L, NW, B, 2, N, Dc, W] int8 (K at 0, V at 1)
    scale: jax.Array  # [L, NW, B, 2, N, W] f32
    recent: jax.Array  # [L, G, B, N, 2*D] f32 (exact K|V-fused ring)

    @property
    def max_len(self) -> int:
        return self.kv.shape[1] * self.kv.shape[6]


def init_cache(cfg: GPTConfig, batch: int, max_len: int, dtype=None):
    L, H, N, D = cfg.num_layers, cfg.hidden_size, cfg.num_heads, cfg.head_dim
    if cfg.kv_cache_dtype in ("int8", "int4"):
        from ..ops.decode_attention import SEAL_GROUP as G
        from ..ops.decode_attention import WRITE_WINDOW as W
        NW = pad_cache_len(max_len) // W
        Dc = D if cfg.kv_cache_dtype == "int8" else D // 2  # int4 packs 2/byte
        return QuantKVCache(
            jnp.zeros((L, NW, batch, 2, N, Dc, W), jnp.int8),
            jnp.ones((L, NW, batch, 2, N, W), jnp.float32),
            # ring is ALWAYS f32 (exact superset of the compute dtype;
            # tile-alignment rationale in the QuantKVCache docstring)
            jnp.zeros((L, G, batch, N, 2 * D), jnp.float32),
        )
    dtype = dtype or cfg.compute_dtype
    shape = (L, batch, H, max_len)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


# --------------------------------------------------------------------- #
# core
# --------------------------------------------------------------------- #


def should_use_flash(cfg: GPTConfig, seq_len: int) -> bool:
    """Flash-attention eligibility for a training/prefill sequence.
    float16 compute is excluded even when forced: Mosaic has no f16
    lowering ("Unsupported type in mosaic dialect: 'f16'", measured on
    the v5e runtime), so the reference-parity --fp16 path must stay on
    XLA dense attention."""
    if cfg.compute_dtype == jnp.float16:
        return False
    return (cfg.use_flash_attention is True
            or (cfg.use_flash_attention == "auto"
                and seq_len >= cfg.flash_min_seq))


def _dropout(x, rate, seed, train, salt=0):
    """Counter-hash dropout (ops/hash_prng.py): any jax.random draw inside
    the scanned layer body costs a ~3 min first-execution stall on this
    runtime (RngBitGenerator in a device loop); the hash mask is pure VPU
    integer math and bit-reproducible across platforms."""
    if not train or rate <= 0.0 or seed is None:
        return x
    return hash_dropout(x, rate, seed, salt)


def _layer_body(
    cfg: GPTConfig,
    h: jax.Array,  # [B, S, H]
    p: Params,  # one layer's params (leading L stripped)
    mask: jax.Array,
    rng: Optional[jax.Array],
    train: bool,
    kv: Optional[Tuple[jax.Array, jax.Array]] = None,  # FULL caches [L,B,T,H]
    index: Optional[jax.Array] = None,  # write offset into the cache
    layer_idx: Optional[jax.Array] = None,  # which cache layer to touch
    sparse: Optional["SparseSpec"] = None,
    sep_for_flash: Optional[int] = None,  # static sep when mask is causal+sep
    mem: Optional[jax.Array] = None,  # [B, M, H] rolling hidden-state memory
    full_prefix: bool = False,  # static: this chunk IS the whole visible prefix
):
    B, S, H = h.shape
    N, D = cfg.num_heads, cfg.head_dim
    eps = cfg.layernorm_epsilon
    cdt = h.dtype

    # one uint32 seed per layer (derived from the layer's key by pure
    # key-data arithmetic — no in-loop bit generation); salts split the
    # three dropout sites
    lseed = seed_from_key(rng) if (train and rng is not None) else None

    ln1 = layer_norm(h, p["ln_in"]["g"], p["ln_in"]["b"], eps, cfg.pb_relax)
    qkv = (
        _wmul(ln1, p["qkv"], "bsh,hcj->bscj", cdt, out32=False)
        + p["qkv"]["b"].astype(jnp.float32)
    ).astype(cdt)
    q = qkv[:, :, 0].reshape(B, S, N, D)
    k = qkv[:, :, 1].reshape(B, S, N, D)
    v = qkv[:, :, 2].reshape(B, S, N, D)

    if mem is not None:
        # transformer-XL-style mems (sparse_transformer.py:314-321,130-141):
        # the memory is LN'd with this layer's input LN, projected by the
        # same QKV weights, and contributes keys/values only (queries come
        # from the current segment; the reference computes QKV over the
        # concatenation and drops the mem queries)
        lnm = layer_norm(mem.astype(cdt), p["ln_in"]["g"], p["ln_in"]["b"],
                         eps, cfg.pb_relax)
        qkv_m = (
            _wmul(lnm, p["qkv"], "bsh,hcj->bscj", cdt, out32=False)
            + p["qkv"]["b"].astype(jnp.float32)
        ).astype(cdt)
        M = mem.shape[1]
        k = jnp.concatenate([qkv_m[:, :, 1].reshape(B, M, N, D), k], axis=1)
        v = jnp.concatenate([qkv_m[:, :, 2].reshape(B, M, N, D), v], axis=1)

    new_kv = None
    if kv is not None and kv[0].ndim == 7:
        # Quantized cache (cfg.kv_cache_dtype="int8"/"int4"), fused
        # window-blocked layout [L,NW,B,2,N,Dc,W] (QuantKVCache).  Decode
        # (S==1): attention AND the cache update are one fused Pallas
        # kernel — it quantizes this token's K/V, writes the 128-token
        # window containing slot ``index`` back in place (donated
        # buffers), and attends over past-quantized + current-exact keys,
        # streaming only the LIVE windows.  The scalar-prefetch layer
        # index selects the layer's blocks in HBM (no per-layer slice
        # copies off the scan carry).
        ckv, cs, rec = kv
        Dc = ckv.shape[5]  # D (int8) or D//2 (packed int4)
        G = rec.shape[1]
        int4 = Dc != D
        if S == 1:
            # append the current token's exact K/V to the ring (slot
            # index % G — one contiguous [1,1,B,N,2D] update: K|V fused
            # in the lane dim), then the kernel attends sealed-int8
            # windows + the exact ring and seals a whole group into the
            # cache every G-th step
            cols = jnp.concatenate(
                [qkv[:, 0, 1].reshape(B, N, D),
                 qkv[:, 0, 2].reshape(B, N, D)], axis=-1).astype(rec.dtype)
            g = lax.rem(jnp.asarray(index, jnp.int32), G)
            rec = lax.dynamic_update_slice(
                rec, cols[None, None], (layer_idx, g, 0, 0, 0))
            ctx, ckv, cs = decode_attention_quant(
                q[:, 0], rec, ckv, cs, layer_idx, index,
                data_axis=cfg.decode_shard_axis,
                model_axis=cfg.decode_head_axis,
            )
            new_kv = (ckv, cs, rec)
            ctx = ctx.astype(cdt).reshape(B, 1, H)
        else:
            # prefill: quantize + windowed scatter + dense attention over
            # the dequantized layer (one-time cost per sequence; attending
            # to the quantized K/V keeps prefill and decode numerics close)
            quant_fn = quantize_kv4 if int4 else quantize_kv
            dequant_fn = dequantize_kv4 if int4 else dequantize_kv
            k8, ksc = quant_fn(jnp.swapaxes(qkv[:, :, 1], 1, 2), N)
            v8, vsc = quant_fn(jnp.swapaxes(qkv[:, :, 2], 1, 2), N)
            ckv = scatter_kv_columns(ckv, k8, v8, layer_idx, index)
            cs = scatter_kv_scales(cs, ksc, vsc, layer_idx, index)
            # fill the exact ring with the last min(G, S) columns: G
            # consecutive positions cover every mod-G slot, so after this
            # every ring slot g <= p % G holds the exact K/V of the
            # newest position with that residue — exactly what the decode
            # kernel attends for positions in [c0, index].  (Slots for
            # residues older than c0 hold stale data the kernel masks.)
            gl = min(G, S)
            tail = jnp.concatenate(
                [qkv[:, S - gl:, 1].reshape(B, gl, N, D),
                 qkv[:, S - gl:, 2].reshape(B, gl, N, D)],
                axis=-1).astype(rec.dtype)  # [B, gl, N, 2D] K|V lane-fused
            pstart = jnp.asarray(index, jnp.int32) + (S - gl)
            for i in range(gl):
                rec = lax.dynamic_update_slice(
                    rec, tail[:, i][None, None],
                    (layer_idx, lax.rem(pstart + i, G), 0, 0, 0))
            new_kv = (ckv, cs, rec)
            if full_prefix:
                # the chunk IS the whole visible prefix (generation
                # prefill at index 0): attend over the just-quantized
                # local columns.  Re-gathering the layer from the blocked
                # cache instead costs a whole-cache transpose that XLA
                # materializes as TWO padded s8 copies of the cache
                # (9.4GB each at base/B40 — an instant OOM) plus a dense
                # pass over all Tp slots where only S are visible.
                kT = dequant_fn(k8, ksc, cdt)  # [B, N, D, S]
                vT = dequant_fn(v8, vsc, cdt)
                ctx = dense_attention_kvT(
                    q, kT, vT, mask[..., :S]).reshape(B, S, H)
            else:
                k8g, v8g = gather_kv(ckv, layer_idx)
                ksg, vsg = gather_kv_scales(cs, layer_idx)
                kT = dequant_fn(k8g, ksg, cdt)  # [B, N, D, Tp]
                vT = dequant_fn(v8g, vsg, cdt)
                ctx = dense_attention_kvT(q, kT, vT, mask).reshape(B, S, H)
    elif kv is not None:
        # Full [L,B,H,T] caches thread through the layer scan as a carry:
        # one in-place dynamic_update_slice per layer (no xs->ys copies),
        # stored transposed so the in-loop matmuls keep one layout.
        ck, cv = kv
        T = ck.shape[3]
        k_col = jnp.swapaxes(qkv[:, :, 1], 1, 2).astype(ck.dtype)  # [B,H,S]
        v_col = jnp.swapaxes(qkv[:, :, 2], 1, 2).astype(cv.dtype)
        ck = lax.dynamic_update_slice(ck, k_col[None], (layer_idx, 0, 0, index))
        cv = lax.dynamic_update_slice(cv, v_col[None], (layer_idx, 0, 0, index))
        new_kv = (ck, cv)
        kT = lax.dynamic_slice(
            ck, (layer_idx, 0, 0, 0), (1, B, H, T)
        )[0].astype(cdt).reshape(B, N, D, T)
        vT = lax.dynamic_slice(
            cv, (layer_idx, 0, 0, 0), (1, B, H, T)
        )[0].astype(cdt).reshape(B, N, D, T)
        ctx = dense_attention_kvT(q, kT, vT, mask).reshape(B, S, H)

    if kv is not None:
        pass  # ctx computed above on the transposed cache
    elif sparse is not None:
        ctx = pivot_window_attention(
            q, k, v, sparse.pivot_idx, sparse.pivot_mask,
            sparse.query_window, sparse.key_window_times,
            dropout_rate=cfg.attention_dropout, dropout_seed=lseed,
            train=train,
        ).reshape(B, S, H)
    elif (cfg.sp_axis is not None and kv is None and mem is None
          and sep_for_flash is not None and S > 1):
        # sequence-parallel ring attention: S here is the GLOBAL length
        # (GSPMD shards it over cfg.sp_axis; the shard_map inside splits
        # explicitly).  Same hash-dropout keep pattern as the dense path.
        assert S % cfg.sp_num_shards == 0, (
            f"seq {S} must divide sp_num_shards={cfg.sp_num_shards}")
        from ..ops.ring_attention import ring_attention_sharded
        ctx = ring_attention_sharded(
            q, k, v, seq_axis=cfg.sp_axis, n_shards=cfg.sp_num_shards,
            data_axis=cfg.sp_data_axis, head_axis=cfg.sp_head_axis,
            sep=sep_for_flash, dropout_rate=cfg.attention_dropout,
            dropout_seed=lseed, train=train,
        ).reshape(B, S, H)
    elif should_use_flash(cfg, S) and kv is None and sep_for_flash is not None:
        # attention-prob dropout runs inside the kernel (hash-PRNG seeded
        # from this layer's attention key — ops/flash_attention.py)
        rate = cfg.attention_dropout if lseed is not None else 0.0
        seed = (lseed ^ jnp.uint32(0x5BD1E995)) if rate > 0.0 else None
        from ..ops.flash_attention import pick_flash_blocks
        abq, abk = pick_flash_blocks(S)
        ctx = flash_attention(
            q, k, v, sep_for_flash,
            block_q=cfg.flash_block_q or abq,
            block_k=cfg.flash_block_k or abk,
            dropout_rate=rate, dropout_seed=seed,
        ).reshape(B, S, H)
    else:
        ctx = dense_attention(
            q, k, v, mask,
            dropout_rate=cfg.attention_dropout, dropout_seed=lseed,
            train=train,
        ).reshape(B, S, H)

    attn_out = (
        _wmul(ctx, p["attn_out"], "bsh,hj->bsj", cdt, out32=False)
        + p["attn_out"]["b"].astype(jnp.float32)
    ).astype(cdt)
    attn_out = _dropout(attn_out, cfg.output_dropout, lseed, train, salt=2)
    if cfg.sandwich_ln:
        attn_out = layer_norm(attn_out, p["ln_attn"]["g"], p["ln_attn"]["b"], eps, cfg.pb_relax)
    h = h + attn_out

    ln2 = layer_norm(h, p["ln_post"]["g"], p["ln_post"]["b"], eps, cfg.pb_relax)
    inter = (
        _wmul(ln2, p["mlp_in"], "bsh,hj->bsj", cdt, out32=False)
        + p["mlp_in"]["b"].astype(jnp.float32)
    ).astype(cdt)
    inter = jax.nn.gelu(inter, approximate=True)
    mlp_out = (
        _wmul(inter, p["mlp_out"], "bsj,jh->bsh", cdt, out32=False)
        + p["mlp_out"]["b"].astype(jnp.float32)
    ).astype(cdt)
    mlp_out = _dropout(mlp_out, cfg.output_dropout, lseed, train, salt=3)
    if cfg.sandwich_ln:
        mlp_out = layer_norm(mlp_out, p["ln_mlp"]["g"], p["ln_mlp"]["b"], eps, cfg.pb_relax)
    h = h + mlp_out
    return h, new_kv


def _embed(params, cfg, tokens, position_ids, rng, train):
    cdt = cfg.compute_dtype
    word = params["embed"]["word"]
    if "w8" in word:
        rows = jnp.take(word["w8"], tokens, axis=0).astype(jnp.float32)
        h = (rows * jnp.take(word["s"], tokens, axis=0)[..., None]).astype(cdt)
    else:
        h = jnp.take(word, tokens, axis=0).astype(cdt)
    h = h + jnp.take(params["embed"]["pos"], position_ids, axis=0).astype(cdt)
    seed = seed_from_key(rng) if (train and rng is not None) else None
    return _dropout(h, cfg.embedding_dropout, seed, train, salt=4)


def _logits(params, cfg, h):
    """Tied output projection (gpt2_modeling.py:115-118), fp32 logits."""
    word = params["embed"]["word"]
    leaf = word if isinstance(word, dict) else {"w": word}
    return _wmul(h, leaf, "bsh,vh->bsv", h.dtype)


def _maybe_checkpoint(body, remat):
    """Apply the activation-remat policy to a scanned layer body.

    remat=True recomputes everything; remat="dots" keeps the batch-dim-free
    matmul outputs (qkv/attn_out/mlp projections) and recomputes only cheap
    elementwise work — more memory, fewer MXU-pass replays (pick per
    config; bench COGVIEW_BENCH_REMAT).

    FORWARD-ONLY callers must pass remat=False: a policy checkpoint in a
    non-differentiated trace measured 19x SLOWER than the bare forward on
    v5e (2120 vs 109.5 ms/step, tutorial b16 — scripts/
    train_phase_microbench.py --phases fwd --remat dots|0, r5), while
    plain remat=True is free there.  Under jax.grad the policy costs
    nothing extra (grad 369 ms/step contains the same forward).  The
    eval path (cli/pretrain.py eval step) already passes remat=False."""
    if not remat:
        return body
    if remat == "dots":
        # also save the flash kernel's named outputs (o, lse): without
        # them the backward replay re-runs the whole forward pallas call
        # per layer just to rebuild those residuals
        # (ops/flash_attention.py _flash_fwd_impl)
        policy = jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            jax.checkpoint_policies.save_only_these_names(
                "flash_o", "flash_lse"),
        )
    else:
        policy = None
    return jax.checkpoint(body, prevent_cse=False, policy=policy)


def forward(
    params: Params,
    cfg: GPTConfig,
    tokens: jax.Array,  # [B, S] int32
    position_ids: Optional[jax.Array] = None,  # [B, S]
    attention_mask: Optional[jax.Array] = None,  # [.., Sq, Sk] or None=causal
    *,
    sep: int = 0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    remat: bool = False,
    sparse: Optional[SparseSpec] = None,
    logits_from: Optional[int] = None,
    return_hidden: bool = False,
) -> jax.Array:
    """Full forward -> fp32 logits [B, S, V].

    ``return_hidden=True`` returns the post-final-LN hidden states
    [B, S, H] instead of logits, for callers that fuse the vocab
    projection into a chunked loss (training.losses.cross_entropy_hidden)
    and must never materialize the full [B, S, V] tensor.

    ``logits_from=t`` returns logits only for positions >= t ([B, S-t, V]):
    the [S, V] projection is the single biggest tensor a long-context
    forward makes (1048x58240 f32 = 245MB/row at cogview-base), and
    callers like caption scoring need just the text tail.

    ``sparse`` switches every layer to pivot+window attention (the
    reference's is_sparse=1 training mode); the dense mask args are then
    ignored.  One pivot set serves all layers of the call — the reference
    resamples per activation-checkpoint chunk
    (sparse_transformer.py:555-570), a regularization nuance the caller can
    reproduce by splitting the forward."""
    B, S = tokens.shape
    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    sep_for_flash = None
    if attention_mask is None:
        attention_mask = causal_mask(S, sep=sep)
        sep_for_flash = sep  # mask is exactly causal+sep: flash-eligible

    if rng is not None:
        rng, r_embed = jax.random.split(rng)
        layer_rngs = jax.random.split(rng, cfg.num_layers)
    else:
        r_embed = None
        layer_rngs = jnp.zeros((cfg.num_layers, 2), jnp.uint32)

    h = _embed(params, cfg, tokens, position_ids, r_embed, train)

    if cfg.pp_axis is not None:
        # pipeline parallelism: layers shard over cfg.pp_axis, GPipe
        # microbatch schedule (parallel/pipeline.py).  Sparse pivot+window
        # attention rides along: the pivot set is per-sample state, so its
        # [B, ...] arrays enter as mb_aux and each stage slices the chunk
        # of whichever microbatch it is computing.  sp_axis stays excluded
        # — ring attention is its own manual collective over a 'seq' axis
        # and cannot nest inside the 'pipe' shard_map (composition matrix
        # in PARITY.md).
        assert cfg.sp_axis is None, (
            "pp_axis composes with DP/TP/FSDP/sparse, not sp_axis")
        assert cfg.num_layers % cfg.pp_num_stages == 0, (
            cfg.num_layers, cfg.pp_num_stages)
        from ..parallel.pipeline import gpipe_scan

        if sparse is not None:
            def layer_fn(a, p, r, pivot_idx, pivot_mask, mask):
                rr = r if (train and rng is not None) else None
                sp = SparseSpec(pivot_idx, pivot_mask,
                                sparse.query_window, sparse.key_window_times)
                a, _ = _layer_body(cfg, a, p, mask, rr, train, sparse=sp)
                return a
            mb_aux = (sparse.pivot_idx, sparse.pivot_mask)
        else:
            def layer_fn(a, p, r, mask):
                rr = r if (train and rng is not None) else None
                a, _ = _layer_body(cfg, a, p, mask, rr, train,
                                   sep_for_flash=sep_for_flash)
                return a
            mb_aux = ()

        # raw key data: the pipeline xors a microbatch index into each
        # layer key (seed_from_key accepts raw data; typed key dtypes
        # reject bitwise ops, and fold_in would put a bit-generator in
        # the tick loop — a known minutes-long stall on this runtime)
        raw_rngs = (jax.random.key_data(layer_rngs)
                    if jax.dtypes.issubdtype(layer_rngs.dtype,
                                             jax.dtypes.prng_key)
                    else layer_rngs)
        h = gpipe_scan(
            layer_fn, params["layers"], raw_rngs, h, attention_mask,
            pipe_axis=cfg.pp_axis, n_stages=cfg.pp_num_stages,
            n_microbatches=cfg.pp_microbatches or cfg.pp_num_stages,
            remat=bool(remat), mb_aux=mb_aux)
    else:
        def body(h, xs):
            p, r = xs
            r = r if (train and rng is not None) else None
            h, _ = _layer_body(cfg, h, p, attention_mask, r, train,
                               sparse=sparse, sep_for_flash=sep_for_flash)
            return h, None

        body = _maybe_checkpoint(body, remat)
        h, _ = lax.scan(body, h, (params["layers"], layer_rngs))

    if logits_from is not None:
        h = h[:, logits_from:]
    h = layer_norm(h, params["ln_final"]["g"], params["ln_final"]["b"], cfg.layernorm_epsilon, cfg.pb_relax)
    if return_hidden:
        return h
    return _logits(params, cfg, h)


def update_mems(hiddens: jax.Array, mems: Optional[jax.Array],
                max_memory_length: int) -> jax.Array:
    """Rolling detached memory window (sparse_transformer.py:615-626).

    hiddens: [L+1, B, S, H] this segment's layer inputs (embedding output +
    every layer output); mems: [L+1, B, M, H] or None.  Returns the new
    [L+1, B, M', H] with M' = min(max_memory_length, M + S), static.
    """
    S = hiddens.shape[2]
    M = 0 if mems is None else mems.shape[2]
    new_len = min(max_memory_length, M + S)
    if new_len <= S:
        out = hiddens[:, :, S - new_len:]
    else:
        out = jnp.concatenate([mems[:, :, M - (new_len - S):], hiddens], axis=2)
    return jax.lax.stop_gradient(out)


def forward_with_mems(
    params: Params,
    cfg: GPTConfig,
    tokens: jax.Array,  # [B, S]
    mems: Optional[jax.Array] = None,  # [L+1, B, M, H] from the prior segment
    *,
    max_memory_length: int,
    position_ids: Optional[jax.Array] = None,
    sep: int = 0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    remat: bool = False,
    return_hidden: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Training-time transformer-XL mems (``max_memory_length > 0``,
    sparse_transformer.py:471-626): every memory position is visible to
    every query (build_mask_matrix gives the leading M keys to all rows),
    keys/values extend over LN(mem) ++ LN(h), and the returned mems are
    the detached rolling window of this segment's layer inputs.

    mems entry i feeds layer i; entry 0 is the post-embedding hidden state,
    entry L (the final layer's output) rides along exactly as in the
    reference (returned, never consumed).  -> (logits [B,S,V] fp32,
    new_mems [L+1, B, M', H]).
    """
    B, S = tokens.shape
    L = cfg.num_layers
    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    M = 0 if mems is None else mems.shape[2]
    mask = causal_mask(S, sk=M + S, sep=sep)

    if rng is not None:
        rng, r_embed = jax.random.split(rng)
        layer_rngs = jax.random.split(rng, L)
    else:
        r_embed = None
        layer_rngs = jnp.zeros((L, 2), jnp.uint32)

    h = _embed(params, cfg, tokens, position_ids, r_embed, train)
    layer_mems = None if mems is None else mems[:L]

    def body(h, xs):
        if mems is None:
            p, r = xs
            mem_i = None
        else:
            p, r, mem_i = xs
        r = r if (train and rng is not None) else None
        h_out, _ = _layer_body(cfg, h, p, mask, r, train, mem=mem_i)
        return h_out, h_out

    body = _maybe_checkpoint(body, remat)
    xs = (params["layers"], layer_rngs) if mems is None else (
        params["layers"], layer_rngs, layer_mems)
    h_final, layer_outs = lax.scan(body, h, xs)

    hiddens = jnp.concatenate([h[None], layer_outs], axis=0)  # [L+1,B,S,H]
    new_mems = update_mems(hiddens, mems, max_memory_length)

    out = layer_norm(h_final, params["ln_final"]["g"], params["ln_final"]["b"],
                     cfg.layernorm_epsilon, cfg.pb_relax)
    if return_hidden:
        return out, new_mems
    return _logits(params, cfg, out), new_mems


def forward_with_cache(
    params: Params,
    cfg: GPTConfig,
    tokens: jax.Array,  # [B, Q]
    position_ids: jax.Array,  # [B, Q] embedding positions (may restart at ROI2)
    cache: KVCache,
    index: jax.Array,  # scalar int32: absolute write offset in the cache
) -> Tuple[jax.Array, KVCache]:
    """Prefill (Q = context len) or decode (Q = 1..n) step.

    Attention visibility uses absolute slot positions (index + arange(Q)),
    independent of ``position_ids`` which only select position embeddings
    (the super-resolution templates restart them at [ROI2],
    pretrain_gpt2.py:228-247).
    Returns fp32 logits [B, Q, V] and the updated cache.

    Quantized caches (QuantKVCache) are sequencing-constrained: every
    Q>1 prefill chunk must precede the first Q==1 decode step.  Decode
    defers cache sealing to every SEAL_GROUP-th step, so after a
    G-unaligned decode the newest positions live ONLY in the exact ring;
    a subsequent Q>1 chunk would attend unsealed (garbage) cache slots
    and could evict the ring columns before they seal.  Full-precision
    KVCache has no such restriction.
    """
    B, Q = tokens.shape
    T = cache.max_len
    h = _embed(params, cfg, tokens, position_ids, None, False)

    q_abs = index + jnp.arange(Q, dtype=jnp.int32)
    mask = decode_mask(jnp.broadcast_to(q_abs, (B, Q)), T)
    quant = isinstance(cache, QuantKVCache)
    # Static prefill-from-zero detection: the sampler passes a LITERAL 0,
    # so "this chunk is the whole visible prefix" is knowable at trace
    # time and the layer can attend over the local chunk instead of the
    # full padded cache (see _layer_body).  int() also concretizes a
    # non-traced jnp scalar; under jit even jnp.int32(0) is a (constant)
    # tracer that refuses int() — callers there must pass Python 0.
    if Q > 1:
        try:
            full_prefix = int(index) == 0
        except (jax.errors.ConcretizationTypeError,
                jax.errors.TracerIntegerConversionError):
            full_prefix = False
            if quant:
                # Every legitimate Q>1 prefill is host-driven with a
                # CONCRETE chunk-start index; a TRACED index here is the
                # signature of chunking mid-generation (e.g. from inside
                # the decode loop), which silently attends unsealed cache
                # slots — fail loudly at trace time instead.
                raise ValueError(
                    "forward_with_cache: Q>1 chunk with a traced index on "
                    "a quantized cache — prefill chunks must be "
                    "host-driven (concrete index) and precede all decode "
                    "steps (see the sequencing contract in this "
                    "function's docstring)")
    else:
        full_prefix = False

    def body(carry, p):
        h, li = carry[0], carry[-1]
        kv = carry[1:-1]
        h, new_kv = _layer_body(
            cfg, h, p, mask, None, False, kv=kv, index=index, layer_idx=li,
            full_prefix=full_prefix,
        )
        return (h, *new_kv, li + 1), None

    init = (h, *cache, jnp.int32(0))
    out, _ = lax.scan(body, init, params["layers"])
    h, new_cache = out[0], out[1:-1]
    h = layer_norm(h, params["ln_final"]["g"], params["ln_final"]["b"], cfg.layernorm_epsilon, cfg.pb_relax)
    cache_cls = QuantKVCache if quant else KVCache
    return _logits(params, cfg, h), cache_cls(*new_cache)
