"""Chunked (vocab-projection-fused) CE == naive full-logits CE.

The reference's vocab-parallel CE (mpu/cross_entropy.py:25-104) avoids
materializing [S, V] probabilities via a custom softmax-minus-onehot
backward; cross_entropy_hidden is the XLA-era equivalent (scan over
sequence chunks + remat).  These tests pin value AND gradient equality
against the naive path, plus end-to-end lm_loss parity before/after the
fusion.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cogview_tpu.config import tiny_test
from cogview_tpu.models import gpt
from cogview_tpu.training.losses import (
    _pick_ce_chunk,
    cross_entropy_hidden,
    cross_entropy_logits,
    lm_loss,
)


def _naive_ce_from_hidden(params, h, labels):
    logits = gpt._logits(params, {}, h)
    return cross_entropy_logits(logits, labels)


def test_pick_chunk():
    assert _pick_ce_chunk(1088, 160) == 136
    assert _pick_ce_chunk(64, 160) == 64
    assert _pick_ce_chunk(17, 16) == 1
    assert _pick_ce_chunk(96, 32) == 32


def test_auto_chunk_resolution():
    """chunk_target=0: full logits while [B,S,V] fp32 <= ~4.5 GiB (the
    measured-faster path), chunked scan above (the memory-capped path)."""
    B, S, H = 2, 320, 8  # S > the 160-token chunk so chunking can engage
    key = jax.random.PRNGKey(3)
    h = jax.random.normal(key, (B, S, H), jnp.float32)
    labels = jnp.zeros((B, S), jnp.int32)

    def n_scans(V):
        word = jax.ShapeDtypeStruct((V, H), jnp.float32)
        jaxpr = jax.make_jaxpr(
            lambda p, h: cross_entropy_hidden(p, h, labels)
        )({"embed": {"word": word}}, h)
        return str(jaxpr.jaxpr).count("scan[")

    assert n_scans(256) == 0  # tiny vocab -> naive full-logits path
    # a vocab big enough that B*S*V*4 > 4.5 GiB must select the scan
    big_v = (5 << 30) // (B * S * 4)
    assert n_scans(big_v) >= 1


@pytest.mark.parametrize("S,target", [(64, 16), (64, 64), (60, 16)])
def test_chunked_ce_matches_naive_value_and_grad(S, target):
    B, H, V = 2, 64, 384
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    h = jax.random.normal(k1, (B, S, H), jnp.float32)
    word = jax.random.normal(k2, (V, H), jnp.float32) * 0.02
    labels = jax.random.randint(k3, (B, S), 0, V)
    params = {"embed": {"word": word}}

    def loss_chunked(params, h):
        return jnp.sum(
            cross_entropy_hidden(params, h, labels, chunk_target=target))

    def loss_naive(params, h):
        return jnp.sum(_naive_ce_from_hidden(params, h, labels))

    ce_c = cross_entropy_hidden(params, h, labels, chunk_target=target)
    ce_n = _naive_ce_from_hidden(params, h, labels)
    np.testing.assert_allclose(np.asarray(ce_c), np.asarray(ce_n),
                               rtol=1e-6, atol=1e-6)

    gc = jax.grad(loss_chunked, argnums=(0, 1))(params, h)
    gn = jax.grad(loss_naive, argnums=(0, 1))(params, h)
    for a, b in zip(jax.tree.leaves(gc), jax.tree.leaves(gn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_chunked_ce_bf16_compute_path():
    # The production path: bf16 hidden, matmul accumulates fp32 — the
    # chunked einsum must follow the exact same dtype route as _logits.
    B, S, H, V = 2, 32, 64, 256
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    h = jax.random.normal(k1, (B, S, H), jnp.bfloat16)
    word = (jax.random.normal(k2, (V, H), jnp.float32) * 0.02).astype(
        jnp.bfloat16)
    labels = jax.random.randint(k3, (B, S), 0, V)
    params = {"embed": {"word": word}}
    ce_c = cross_entropy_hidden(params, h, labels, chunk_target=8)
    ce_n = _naive_ce_from_hidden(params, h, labels)
    np.testing.assert_array_equal(np.asarray(ce_c), np.asarray(ce_n))


def test_lm_loss_end_to_end_matches_prefusion():
    # lm_loss (now hidden+chunked) == explicit forward->logits->CE route.
    cfg = tiny_test(num_heads=4, vocab_size=320, max_position_embeddings=64)
    params = gpt.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.RandomState(0)
    batch = {
        "text": jnp.asarray(rng.randint(0, 320, (2, 49)), jnp.int32),
        "loss_mask": jnp.ones((2, 49), jnp.float32),
    }
    loss, metrics = lm_loss(params, cfg, batch, img_vocab=64,
                            txt_loss_scale=3.0, train=False)

    tokens = batch["text"][:, :-1]
    labels = batch["text"][:, 1:]
    logits = gpt.forward(params, cfg, tokens, train=False)
    ce = cross_entropy_logits(logits, labels)
    lmask = jnp.ones_like(ce)
    img_ind = tokens < 64
    txt_ind = ~img_ind
    lmask = jnp.where(txt_ind, lmask * 3.0, lmask)
    ref = jnp.sum(ce * lmask) / jnp.sum(lmask)
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-6)
    assert np.isfinite(float(metrics["img_loss"]))
    assert np.isfinite(float(metrics["txt_loss"]))
