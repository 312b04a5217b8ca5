"""Quantized (int8) KV cache: fused Pallas decode kernel vs dense
reference, quantization error bounds, and end-to-end cache/forward parity.

The kernel runs in interpreter mode on CPU; the same code compiles on TPU
(bench decode mode exercises it at cogview-base scale).

r4 "deferred seal" contract (ops/decode_attention.py): the kernel attends
dequantized SEALED cache slots (kpos < c0 = index - index % G) plus the
EXACT ring columns for positions [c0, index], and writes the cache only on
seal steps (index % G == G-1), quantizing the whole group at once.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cogview_tpu.config import tiny_test
from cogview_tpu.models import gpt
from cogview_tpu.ops.decode_attention import (
    SEAL_GROUP,
    columns_from_fused,
    decode_attention_quant,
    dequantize_kv,
    fuse_ring,
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


def _make_ring(rng, L, B, N, D, idx):
    """Exact ring with positions [c0, idx] filled; returns (fused-layout
    device ring [L, G, B, N, 2D], split numpy ring [L, G, B, 2, N, D]
    for the reference math, rem)."""
    G = SEAL_GROUP
    rem = idx % G
    ring = rng.randn(L, G, B, 2, N, D).astype(np.float32)
    return fuse_ring(ring), ring, rem


def _dense_reference(q, kd, vd, c0, ring_l, rem, D):
    """numpy: dense softmax over dequantized sealed slots [0, c0) + exact
    ring slots 0..rem (positions c0..c0+rem)."""
    B, N, _ = q.shape
    T = kd.shape[3]
    qs = q / math.sqrt(D)
    s = np.einsum("bnd,bndt->bnt", qs, kd)
    s = np.where(np.arange(T)[None, None, :] < c0, s, -10000.0)
    s_r = np.einsum("bnd,gbnd->bng", qs, ring_l[: rem + 1, :, 0])
    s_all = np.concatenate([s, s_r], axis=-1)
    p = np.exp(s_all - s_all.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    v_all = np.concatenate(
        [vd, np.moveaxis(ring_l[: rem + 1, :, 1], 0, 3)], axis=3)
    return np.einsum("bnt,bndt->bnd", p, v_all)


@pytest.mark.parametrize("hb,idx", [(2, 10), (4, 133), (4, 8)])
def test_kernel_matches_dense_reference(hb, idx):
    """Fused kernel == dense attention over (dequantized sealed cache +
    exact ring positions [c0, index]); on non-seal steps the cache passes
    through bit-untouched."""
    G = SEAL_GROUP
    L, B, N, D, T = 3, 2, 4, 16, pad_cache_len(200)
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    k8 = jnp.asarray(rng.randint(-127, 128, (L, B, N, D, T)).astype(np.int8))
    v8 = jnp.asarray(rng.randint(-127, 128, (L, B, N, D, T)).astype(np.int8))
    ks = jnp.asarray(rng.rand(L, B, N, T).astype(np.float32) * 0.1)
    vs = jnp.asarray(rng.rand(L, B, N, T).astype(np.float32) * 0.1)
    ring, ring_np, rem = _make_ring(rng, L, B, N, D, idx)
    li = 1
    c0 = idx - rem
    assert rem != G - 1, "dense-reference cases must be non-seal steps"

    ctx, kvn, sn = decode_attention_quant(
        q, ring, fused_from_columns(k8, v8), fused_from_columns(ks, vs),
        li, idx, head_block=hb)

    kd = np.asarray(dequantize_kv(k8[li], ks[li]))  # [B,N,D,T]
    vd = np.asarray(dequantize_kv(v8[li], vs[li]))
    want = _dense_reference(np.asarray(q), kd, vd, c0, ring_np[li], rem, D)
    np.testing.assert_allclose(np.asarray(ctx), want, atol=2e-5)

    # non-seal step: the cache is bit-untouched
    k8n, v8n = columns_from_fused(kvn)
    ksn, vsn = columns_from_fused(sn)
    np.testing.assert_array_equal(np.asarray(k8n), np.asarray(k8))
    np.testing.assert_array_equal(np.asarray(v8n), np.asarray(v8))
    np.testing.assert_array_equal(np.asarray(ksn), np.asarray(ks))
    np.testing.assert_array_equal(np.asarray(vsn), np.asarray(vs))


@pytest.mark.parametrize("idx", [15, 135, 7])
def test_kernel_seal_writeback(idx):
    """On seal steps (index % G == G-1) the group's G ring columns land
    quantized in cache slots [c0, c0+G); sealed slots below c0 and other
    layers stay untouched."""
    G = SEAL_GROUP
    assert idx % G == G - 1
    L, B, N, D, T = 3, 2, 4, 16, pad_cache_len(200)
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    k8 = jnp.asarray(rng.randint(-127, 128, (L, B, N, D, T)).astype(np.int8))
    v8 = jnp.asarray(rng.randint(-127, 128, (L, B, N, D, T)).astype(np.int8))
    ks = jnp.asarray(rng.rand(L, B, N, T).astype(np.float32) * 0.1)
    vs = jnp.asarray(rng.rand(L, B, N, T).astype(np.float32) * 0.1)
    ring, ring_np, rem = _make_ring(rng, L, B, N, D, idx)
    li = 1
    c0 = idx - rem

    ctx, kvn, sn = decode_attention_quant(
        q, ring, fused_from_columns(k8, v8), fused_from_columns(ks, vs),
        li, idx, head_block=4)
    k8n, v8n = columns_from_fused(kvn)
    ksn, vsn = columns_from_fused(sn)

    # the sealed group == quantize_kv of the exact ring columns
    for g in range(G):
        kc = ring_np[li, g, :, 0]  # [B, N, D]
        kc8, kcs = quantize_kv(jnp.asarray(kc).reshape(B, N * D, 1), N)
        np.testing.assert_array_equal(
            np.asarray(k8n[li, :, :, :, c0 + g]), np.asarray(kc8[:, :, :, 0]))
        np.testing.assert_allclose(
            np.asarray(ksn[li, :, :, c0 + g]), np.asarray(kcs[:, :, 0]),
            rtol=1e-6)
        vc = ring_np[li, g, :, 1]
        vc8, vcs = quantize_kv(jnp.asarray(vc).reshape(B, N * D, 1), N)
        np.testing.assert_array_equal(
            np.asarray(v8n[li, :, :, :, c0 + g]), np.asarray(vc8[:, :, :, 0]))
        np.testing.assert_allclose(
            np.asarray(vsn[li, :, :, c0 + g]), np.asarray(vcs[:, :, 0]),
            rtol=1e-6)
    # sealed slots below c0 and other layers untouched (slots >= c0+G of
    # the TARGET window may legitimately hold staging bytes — they are
    # invisible until their own seal overwrites them)
    np.testing.assert_array_equal(np.asarray(k8n[li, :, :, :, :c0]),
                                  np.asarray(k8[li, :, :, :, :c0]))
    np.testing.assert_array_equal(np.asarray(vsn[li, :, :, :c0]),
                                  np.asarray(vs[li, :, :, :c0]))
    np.testing.assert_array_equal(np.asarray(k8n[0]), np.asarray(k8[0]))
    np.testing.assert_array_equal(np.asarray(v8n[2]), np.asarray(v8[2]))
    np.testing.assert_array_equal(np.asarray(ksn[0]), np.asarray(ks[0]))


@pytest.mark.parametrize("B,rb", [(3, 1), (4, 2), (4, 1)])
def test_kernel_row_block_equivalence(B, rb):
    """row_block (rows fused per DMA iteration — the r4 perf lever) is
    layout-only: rb=2 == rb=1 bit-for-bit, and odd batches run at rb=1."""
    from cogview_tpu.ops.decode_attention import pick_row_block
    assert pick_row_block(3, 4, 16) == 1  # odd batch falls back
    L, N, D, T = 2, 4, 16, pad_cache_len(24)
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    ring = fuse_ring(
        rng.randn(L, SEAL_GROUP, B, 2, N, D).astype(np.float32))
    kv8 = fused_from_columns(
        jnp.asarray(rng.randint(-127, 128, (L, B, N, D, T)).astype(np.int8)),
        jnp.asarray(rng.randint(-127, 128, (L, B, N, D, T)).astype(np.int8)))
    kvs = fused_from_columns(
        jnp.asarray(rng.rand(L, B, N, T).astype(np.float32) * 0.1),
        jnp.asarray(rng.rand(L, B, N, T).astype(np.float32) * 0.1))
    for idx in (10, 15):  # non-seal and seal steps
        outs = [
            decode_attention_quant(q, ring, kv8, kvs, 1, idx,
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
    monolithic forward within quantization tolerance (spanning several
    seal boundaries)."""
    cfg = tiny_test(compute_dtype=jnp.float32, kv_cache_dtype="int8")
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, S, ctx = 2, 30, 12
    tokens = jnp.asarray(rng.randint(0, 128, (B, S)).astype(np.int32))
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    want = np.asarray(gpt.forward(params, cfg, tokens))

    cache = gpt.init_cache(cfg, B, S)
    assert isinstance(cache, gpt.QuantKVCache)
    assert cache.max_len == pad_cache_len(S)
    assert cache.kv.shape[1] == pad_cache_len(S) // 128  # window-blocked
    assert cache.recent.shape[1] == SEAL_GROUP
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
    seq = [tok["[ROI1]"], 70, 71, tok["[BOI1]"]] + [-1] * 12
    tpl = compile_template(seq, tok, padded_vocab=cfg.vocab_size)
    out, scores = filling_sequence(
        params, cfg, tpl, batch_size=2, sampling=SamplingParams(seed=3))
    out = np.asarray(out)
    assert (out[:, 0] == tok["[ROI1]"]).all() and (out[:, 3] == tok["[BOI1]"]).all()
    assert (out[:, 4:] < 64).all(), "image-mode slots must be image codes"
    assert np.isfinite(np.asarray(scores)).all()
