"""int4 packed KV cache (opt-in): nibble pack/unpack roundtrip, fused
kernel vs dense reference over the dequantized cache, and end-to-end
decode parity at int4 tolerance.  Interpret mode on CPU; same code
compiles on TPU (COGVIEW_BENCH_KV=int4)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cogview_tpu.config import tiny_test
from cogview_tpu.models import gpt
from cogview_tpu.ops.decode_attention import (
    columns_from_fused,
    decode_attention_quant4,
    dequantize_kv4,
    fuse_ring,
    fused_from_columns,
    pad_cache_len,
    quantize_kv4,
)


def test_quantize4_roundtrip_error():
    rng = np.random.RandomState(0)
    cols = jnp.asarray(rng.randn(2, 64, 7).astype(np.float32) * 3.0)
    q4, s = quantize_kv4(cols, num_heads=4)  # [B,N,D/2,S], [B,N,S]
    assert q4.shape == (2, 4, 8, 7) and q4.dtype == jnp.int8
    back = np.asarray(dequantize_kv4(q4, s))  # [B,N,D,S]
    want = np.asarray(cols).reshape(2, 4, 16, 7)
    # absmax int4: error <= scale/2 = absmax/14 per (head, token) group
    err = np.abs(back - want)
    bound = np.abs(want).max(axis=2) / 14.0 + 1e-6
    assert (err <= bound[:, :, None, :] + 1e-5).all()


def test_pack_unpack_nibbles_exact():
    """Every (hi, lo) nibble pair in [-7,7]^2 survives the pack/unpack."""
    hi, lo = np.meshgrid(np.arange(-7, 8), np.arange(-7, 8), indexing="ij")
    packed = (16 * hi + lo + 8).astype(np.int8)
    bf = packed.astype(np.float32)
    hi2 = np.floor(bf / 16.0)
    lo2 = bf - 16.0 * hi2 - 8.0
    np.testing.assert_array_equal(hi2, hi.astype(np.float32))
    np.testing.assert_array_equal(lo2, lo.astype(np.float32))


@pytest.mark.parametrize("hb,idx", [(2, 10), (4, 12)])
def test_kernel4_matches_dense_reference(hb, idx):
    from cogview_tpu.ops.decode_attention import SEAL_GROUP as G

    L, B, N, D, T = 3, 2, 4, 16, pad_cache_len(24)
    D2 = D // 2
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    ring_np = rng.randn(L, G, B, 2, N, D).astype(np.float32)
    ring = fuse_ring(ring_np)
    # valid packed bytes: 16*hi + lo + 8 with hi, lo in [-7, 7]
    hi = rng.randint(-7, 8, (L, B, N, D2, T))
    lo = rng.randint(-7, 8, (L, B, N, D2, T))
    k4 = jnp.asarray((16 * hi + lo + 8).astype(np.int8))
    hi2 = rng.randint(-7, 8, (L, B, N, D2, T))
    lo2 = rng.randint(-7, 8, (L, B, N, D2, T))
    v4 = jnp.asarray((16 * hi2 + lo2 + 8).astype(np.int8))
    ks = jnp.asarray(rng.rand(L, B, N, T).astype(np.float32) * 0.1)
    vs = jnp.asarray(rng.rand(L, B, N, T).astype(np.float32) * 0.1)
    li = 1
    rem = idx % G
    c0 = idx - rem
    assert rem != G - 1  # non-seal: cache must pass through untouched

    ctx, kvn, sn = decode_attention_quant4(
        q, ring, fused_from_columns(k4, v4), fused_from_columns(ks, vs),
        li, idx, head_block=hb)
    k4n, v4n = columns_from_fused(kvn)

    kd = np.asarray(dequantize_kv4(k4[li], ks[li]))  # [B,N,D,T]
    vd = np.asarray(dequantize_kv4(v4[li], vs[li]))
    qs = np.asarray(q) / math.sqrt(D)
    s = np.einsum("bnd,bndt->bnt", qs, kd)
    s = np.where(np.arange(T)[None, None, :] < c0, s, -10000.0)
    s_r = np.einsum("bnd,gbnd->bng", qs, ring_np[li, : rem + 1, :, 0])
    s_all = np.concatenate([s, s_r], axis=-1)
    p = np.exp(s_all - s_all.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    v_all = np.concatenate(
        [vd, np.moveaxis(ring_np[li, : rem + 1, :, 1], 0, 3)], axis=3)
    want = np.einsum("bnt,bndt->bnd", p, v_all)
    np.testing.assert_allclose(np.asarray(ctx), want, atol=2e-5)

    # non-seal: cache bit-untouched
    np.testing.assert_array_equal(np.asarray(k4n), np.asarray(k4))
    np.testing.assert_array_equal(np.asarray(v4n), np.asarray(v4))


def test_kernel4_seal_writeback():
    """Seal step: the ring columns land in the cache int4-packed."""
    from cogview_tpu.ops.decode_attention import SEAL_GROUP as G

    L, B, N, D, T = 2, 2, 4, 16, pad_cache_len(64)
    idx = 2 * G - 1  # seal of group [G, 2G)
    c0 = idx - (G - 1)
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    ring_np = rng.randn(L, G, B, 2, N, D).astype(np.float32)
    k4 = jnp.asarray(np.full((L, B, N, D // 2, T), 8, np.int8))  # zeros packed
    v4 = jnp.asarray(np.full((L, B, N, D // 2, T), 8, np.int8))
    ks = jnp.asarray(np.ones((L, B, N, T), np.float32))
    vs = jnp.asarray(np.ones((L, B, N, T), np.float32))
    li = 0
    ctx, kvn, sn = decode_attention_quant4(
        q, fuse_ring(ring_np), fused_from_columns(k4, v4),
        fused_from_columns(ks, vs), li, idx, head_block=4)
    k4n, v4n = columns_from_fused(kvn)
    ksn, vsn = columns_from_fused(sn)
    for g in range(G):
        kc = ring_np[li, g, :, 0]  # [B, N, D]
        kc4, kcs = quantize_kv4(jnp.asarray(kc).reshape(B, N * D, 1), N)
        np.testing.assert_array_equal(
            np.asarray(k4n[li, :, :, :, c0 + g]), np.asarray(kc4[:, :, :, 0]))
        np.testing.assert_allclose(
            np.asarray(ksn[li, :, :, c0 + g]), np.asarray(kcs[:, :, 0]),
            rtol=1e-6)
    # sealed slots below c0 and the other layer untouched
    np.testing.assert_array_equal(np.asarray(v4n[li, :, :, :, :c0]),
                                  np.asarray(v4[li, :, :, :, :c0]))
    np.testing.assert_array_equal(np.asarray(k4n[1]), np.asarray(k4[1]))


@pytest.mark.slow
def test_int4_cache_decode_tracks_forward():
    """Prefill + decode over the packed int4 cache tracks the monolithic
    forward at int4 tolerance (looser than int8; documented opt-in)."""
    cfg = tiny_test(compute_dtype=jnp.float32, kv_cache_dtype="int4")
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, S, ctx = 2, 20, 12
    tokens = jnp.asarray(rng.randint(0, 128, (B, S)).astype(np.int32))
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    want = np.asarray(gpt.forward(params, cfg, tokens))

    cache = gpt.init_cache(cfg, B, S)
    assert cache.kv.shape[5] == cfg.head_dim // 2  # packed
    logits, cache = gpt.forward_with_cache(
        params, cfg, tokens[:, :ctx], pos[:, :ctx], cache, jnp.int32(0))
    outs = [np.asarray(logits)]
    for t in range(ctx, S):
        lg, cache = gpt.forward_with_cache(
            params, cfg, tokens[:, t:t + 1], pos[:, t:t + 1], cache,
            jnp.int32(t))
        outs.append(np.asarray(lg))
    got = np.concatenate(outs, axis=1)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.15, f"int4 cache relative logit error {rel:.4f}"
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree > 0.8, f"argmax agreement {agree:.2%}"
