"""Weight-only int8 quantization (gpt.quantize_weights): logits stay close
to the full-precision model, the greedy token stream agrees, and the
quantized pytree drives the KV-cached sampler unchanged."""

import numpy as np

import jax
import jax.numpy as jnp

from cogview_tpu.config import tiny_test
from cogview_tpu.models import gpt


CFG = tiny_test()


def _params():
    return gpt.init_params(jax.random.PRNGKey(0), CFG)


def test_quantized_logits_close_and_top1_agrees():
    params = _params()
    qparams = gpt.quantize_weights(params)
    # structure: every big matmul leaf carries w8 + per-output-channel s
    assert qparams["layers"]["qkv"]["w8"].dtype == jnp.int8
    L, H = CFG.num_layers, CFG.hidden_size
    assert qparams["layers"]["qkv"]["s"].shape == (L, 3, H)
    assert qparams["embed"]["word"]["w8"].shape == (CFG.vocab_size, H)
    assert qparams["embed"]["word"]["s"].shape == (CFG.vocab_size,)

    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 120, (2, 24)))
    full = np.asarray(gpt.forward(params, CFG, tokens), np.float32)
    quant = np.asarray(gpt.forward(qparams, CFG, tokens), np.float32)

    scale = np.abs(full).max()
    rel = np.abs(quant - full).max() / scale
    assert rel < 0.05, f"relative logit error {rel}"
    agree = (full.argmax(-1) == quant.argmax(-1)).mean()
    assert agree >= 0.95, f"top-1 agreement {agree}"


def test_quantized_dequant_identity_per_channel():
    """x @ W == (x @ W_q) * s exactly when W = W_q * s (scales are per
    OUTPUT channel, so dequantization commutes with the contraction)."""
    rng = np.random.RandomState(1)
    w8 = rng.randint(-127, 128, (16, 8)).astype(np.int8)
    s = rng.rand(8).astype(np.float32) + 0.5
    x = rng.randn(3, 16).astype(np.float32)
    direct = x @ (w8.astype(np.float32) * s[None, :])
    scaled = (x @ w8.astype(np.float32)) * s[None, :]
    np.testing.assert_allclose(direct, scaled, rtol=1e-5)


def test_quantized_sampler_runs_and_is_deterministic():
    from cogview_tpu.generation.sampling import (
        SamplingParams, compile_template, filling_sequence)
    from cogview_tpu.tokenization.unified import (
        FakeImageTokenizer, UnifiedTokenizer)

    class TinyTxt:
        num_tokens = 64

    tok = UnifiedTokenizer(img_tokenizer=FakeImageTokenizer(32),
                           txt_tokenizer=TinyTxt())
    params = gpt.quantize_weights(_params())
    seq = [tok["[ROI1]"], 40, tok["[BASE]"], tok["[BOI1]"]] + [-1] * 6
    tpl = compile_template(seq, tok, padded_vocab=CFG.vocab_size)
    t1, _ = filling_sequence(params, CFG, tpl, 2, SamplingParams(seed=5))
    t2, _ = filling_sequence(params, CFG, tpl, 2, SamplingParams(seed=5))
    t1, t2 = np.asarray(t1), np.asarray(t2)
    np.testing.assert_array_equal(t1, t2)
    gen = t1[:, 4:]
    assert (gen >= 0).all() and (gen < 32).all()  # image codes only


def test_quantized_params_orbax_roundtrip(tmp_path):
    """A serving snapshot of int8-quantized params survives orbax
    save/load bit-exactly (w8 int8 leaves + f32 scales)."""
    from cogview_tpu.training.checkpointing import (
        load_latest, save_checkpoint)

    qparams = gpt.quantize_weights(_params())
    save_checkpoint(str(tmp_path), 0, {"params": qparams, "iteration": 0})
    restored = load_latest(str(tmp_path), target={"params": qparams,
                                                  "iteration": 0})
    rq = restored["params"]
    assert rq["layers"]["qkv"]["w8"].dtype == jnp.int8
    flat_a, _ = jax.tree.flatten(qparams)
    flat_b, _ = jax.tree.flatten(rq)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
