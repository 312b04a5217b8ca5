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


@pytest.mark.parametrize("hb", [2, 4])
def test_kernel4_matches_dense_reference(hb):
    L, B, N, D, T = 3, 2, 4, 16, pad_cache_len(24)
    D2 = D // 2
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    kc = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    vc = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    # valid packed bytes: 16*hi + lo + 8 with hi, lo in [-7, 7]
    hi = rng.randint(-7, 8, (L, B, N, D2, T))
    lo = rng.randint(-7, 8, (L, B, N, D2, T))
    k4 = jnp.asarray((16 * hi + lo + 8).astype(np.int8))
    hi2 = rng.randint(-7, 8, (L, B, N, D2, T))
    lo2 = rng.randint(-7, 8, (L, B, N, D2, T))
    v4 = jnp.asarray((16 * hi2 + lo2 + 8).astype(np.int8))
    ks = jnp.asarray(rng.rand(L, B, N, T).astype(np.float32) * 0.1)
    vs = jnp.asarray(rng.rand(L, B, N, T).astype(np.float32) * 0.1)
    li, idx = 1, 10

    ctx, kvn, sn = decode_attention_quant4(
        q, kc, vc, fused_from_columns(k4, v4), fused_from_columns(ks, vs),
        li, idx, head_block=hb)
    k4n, v4n = columns_from_fused(kvn)
    ksn, vsn = columns_from_fused(sn)

    kd = np.asarray(dequantize_kv4(k4[li], ks[li]))  # [B,N,D,T]
    vd = np.asarray(dequantize_kv4(v4[li], vs[li]))
    qs = np.asarray(q) / math.sqrt(D)
    s = np.einsum("bnd,bndt->bnt", qs, kd)
    s = np.where(np.arange(T)[None, None, :] < idx, s, -10000.0)
    s_cur = np.einsum("bnd,bnd->bn", qs, np.asarray(kc))[..., None]
    s_all = np.concatenate([s, s_cur], axis=-1)
    p = np.exp(s_all - s_all.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    v_all = np.concatenate([vd, np.asarray(vc)[:, :, :, None]], axis=3)
    want = np.einsum("bnt,bndt->bnd", p, v_all)
    np.testing.assert_allclose(np.asarray(ctx), want, atol=2e-5)

    # write-back: slot idx holds the packed quantized current column
    kc4, kcs = quantize_kv4(kc.reshape(B, N * D, 1), N)
    np.testing.assert_array_equal(np.asarray(k4n[li, :, :, :, idx]),
                                  np.asarray(kc4[:, :, :, 0]))
    np.testing.assert_allclose(np.asarray(ksn[li, :, :, idx]),
                               np.asarray(kcs[:, :, 0]), rtol=1e-6)
    mask = np.ones(T, bool); mask[idx] = False
    np.testing.assert_array_equal(np.asarray(k4n[li][:, :, :, mask]),
                                  np.asarray(k4[li][:, :, :, mask]))
    np.testing.assert_array_equal(np.asarray(v4n[2]), np.asarray(v4[2]))


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
