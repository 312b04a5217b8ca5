"""Quantized (int8) KV cache: fused Pallas decode kernel vs dense
reference, quantization error bounds, and end-to-end cache/forward parity.

The kernel runs in interpreter mode on CPU; the same code compiles on TPU
(bench decode mode exercises it at cogview-base scale).
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cogview_tpu.config import tiny_test
from cogview_tpu.models import gpt
from cogview_tpu.ops.decode_attention import (
    columns_from_fused,
    decode_attention_quant,
    dequantize_kv,
    fused_from_columns,
    pad_cache_len,
    pick_head_block,
    quantize_kv,
)


def test_quantize_roundtrip_error():
    rng = np.random.RandomState(0)
    cols = jnp.asarray(rng.randn(2, 64, 7).astype(np.float32) * 3.0)  # [B,H,S]
    q8, s = quantize_kv(cols, num_heads=4)  # [B,N,D,S], [B,N,S]
    back = np.asarray(dequantize_kv(q8, s))  # [B,N,D,S]
    want = np.asarray(cols).reshape(2, 4, 16, 7)
    # absmax int8: error <= scale/2 = absmax/254 per (head, token) group
    err = np.abs(back - want)
    bound = np.abs(want).max(axis=2) / 254.0 + 1e-6  # [B,N,S]
    assert (err <= bound[:, :, None, :] + 1e-5).all()


@pytest.mark.parametrize("hb", [2, 4])
def test_kernel_matches_dense_reference(hb):
    """Fused kernel == dense attention over (dequantized past cache +
    exact current column), AND the write-back inserts the quantized
    current column without disturbing other slots."""
    L, B, N, D, T = 3, 2, 4, 16, pad_cache_len(24)
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    kc = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    vc = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    k8 = jnp.asarray(rng.randint(-127, 128, (L, B, N, D, T)).astype(np.int8))
    v8 = jnp.asarray(rng.randint(-127, 128, (L, B, N, D, T)).astype(np.int8))
    ks = jnp.asarray(rng.rand(L, B, N, T).astype(np.float32) * 0.1)
    vs = jnp.asarray(rng.rand(L, B, N, T).astype(np.float32) * 0.1)
    li, idx = 1, 10

    ctx, kvn, sn = decode_attention_quant(
        q, kc, vc, fused_from_columns(k8, v8), fused_from_columns(ks, vs),
        li, idx, head_block=hb)
    k8n, v8n = columns_from_fused(kvn)
    ksn, vsn = columns_from_fused(sn)

    kd = np.asarray(dequantize_kv(k8[li], ks[li]))  # [B,N,D,T]
    vd = np.asarray(dequantize_kv(v8[li], vs[li]))
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

    # write-back: slot idx now holds the quantized current column...
    kc8, kcs = quantize_kv(kc.reshape(B, N * D, 1), N)  # [B,N,D,1],[B,N,1]
    np.testing.assert_array_equal(np.asarray(k8n[li, :, :, :, idx]),
                                  np.asarray(kc8[:, :, :, 0]))
    np.testing.assert_allclose(np.asarray(ksn[li, :, :, idx]),
                               np.asarray(kcs[:, :, 0]), rtol=1e-6)
    # ...and every other slot / layer is untouched
    mask = np.ones(T, bool); mask[idx] = False
    np.testing.assert_array_equal(np.asarray(k8n[li][:, :, :, mask]),
                                  np.asarray(k8[li][:, :, :, mask]))
    np.testing.assert_array_equal(np.asarray(k8n[0]), np.asarray(k8[0]))
    np.testing.assert_array_equal(np.asarray(v8n[2]), np.asarray(v8[2]))
    np.testing.assert_array_equal(np.asarray(vsn[0]), np.asarray(vs[0]))


@pytest.mark.parametrize("B,rb", [(3, 1), (4, 2), (4, 1)])
def test_kernel_row_block_equivalence(B, rb):
    """row_block (rows fused per DMA iteration — the r4 perf lever) is
    layout-only: rb=2 == rb=1 bit-for-bit, and odd batches run at rb=1."""
    from cogview_tpu.ops.decode_attention import pick_row_block
    assert pick_row_block(3, 4, 16) == 1  # odd batch falls back
    L, N, D, T = 2, 4, 16, pad_cache_len(24)
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    kc = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    vc = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    kv8 = fused_from_columns(
        jnp.asarray(rng.randint(-127, 128, (L, B, N, D, T)).astype(np.int8)),
        jnp.asarray(rng.randint(-127, 128, (L, B, N, D, T)).astype(np.int8)))
    kvs = fused_from_columns(
        jnp.asarray(rng.rand(L, B, N, T).astype(np.float32) * 0.1),
        jnp.asarray(rng.rand(L, B, N, T).astype(np.float32) * 0.1))
    outs = [
        decode_attention_quant(q, kc, vc, kv8, kvs, 1, 10,
                               head_block=4, row_block=r)
        for r in (rb, 1)
    ]
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pick_head_block_constraints():
    # must divide num_heads and be a multiple of 8 (or the full head count)
    for n, d, t in [(40, 64, 1152), (16, 64, 1152), (8, 8, 128), (4, 16, 128)]:
        hb = pick_head_block(n, d, t)
        assert n % hb == 0
        assert hb == n or hb % 8 == 0
    assert pick_head_block(40, 64, 1152) == 8  # cogview-base: VMEM budget


@pytest.mark.slow
def test_int8_cache_decode_matches_forward():
    """Prefill + token-by-token decode over the int8 cache tracks the
    monolithic forward within quantization tolerance."""
    cfg = tiny_test(compute_dtype=jnp.float32, kv_cache_dtype="int8")
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, S, ctx = 2, 20, 12
    tokens = jnp.asarray(rng.randint(0, 128, (B, S)).astype(np.int32))
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    want = np.asarray(gpt.forward(params, cfg, tokens))

    cache = gpt.init_cache(cfg, B, S)
    assert isinstance(cache, gpt.QuantKVCache)
    assert cache.max_len == pad_cache_len(S)
    assert cache.kv.shape[1] == pad_cache_len(S) // 128  # window-blocked
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
    assert rel < 0.02, f"int8 cache relative logit error {rel:.4f}"
    # and the argmax token stream agrees (tiny random model, wide margins)
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree > 0.95, f"argmax agreement {agree:.2%}"


@pytest.mark.slow
def test_sampler_with_int8_cache():
    """filling_sequence runs end-to-end on the int8 cache: fixed template
    slots preserved, generated slots within the image vocabulary."""
    from cogview_tpu.generation.sampling import (
        SamplingParams, compile_template, filling_sequence)

    class _Tok:
        class _N:
            num_tokens = 64

        class _T:
            num_tokens = 40

        img_tokenizer = _N()
        txt_tokenizer = _T()
        _cmd = {name: 104 + i for i, name in enumerate(
            ["[PAD]", "[BOI1]", "[BOI2]", "[EOI1]", "[EOI2]", "[ROI1]",
             "[ROI2]"])}

        def __getitem__(self, k):
            return self._cmd[k]

    tok = _Tok()
    cfg = tiny_test(compute_dtype=jnp.float32, kv_cache_dtype="int8")
    params = gpt.init_params(jax.random.PRNGKey(1), cfg)
    seq = [tok["[ROI1]"], 70, 71, tok["[BOI1]"]] + [-1] * 8
    tpl = compile_template(seq, tok, padded_vocab=cfg.vocab_size)
    out, scores = filling_sequence(
        params, cfg, tpl, batch_size=2, sampling=SamplingParams(seed=3))
    out = np.asarray(out)
    assert (out[:, 0] == tok["[ROI1]"]).all() and (out[:, 3] == tok["[BOI1]"]).all()
    assert (out[:, 4:] < 64).all(), "image-mode slots must be image codes"
    assert np.isfinite(np.asarray(scores)).all()
