"""Flash attention (Pallas) vs the dense reference, fwd and bwd.

Runs in interpreter mode on CPU (the same kernel code compiles on TPU);
masking semantics (-10000, causal + prefix-LM sep) must match
ops.attention.dense_attention bit-for-bit in fp32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cogview_tpu.ops.attention import causal_mask, dense_attention
from cogview_tpu.ops.flash_attention import flash_attention

B, N, D = 2, 3, 32


def _mk(s, seed=0):
    rng = np.random.RandomState(seed)
    return [jnp.asarray(rng.randn(B, s, N, D).astype(np.float32)) for _ in range(3)]


@pytest.mark.parametrize("s,bq,bk", [(128, 64, 64), (200, 64, 64), (96, 32, 64)])
def test_flash_forward_matches_dense(s, bq, bk):
    q, k, v = _mk(s)
    want = dense_attention(q, k, v, causal_mask(s))
    got = flash_attention(q, k, v, 0, bq, bk, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_flash_sep_prefix():
    s, sep = 128, 37
    q, k, v = _mk(s, seed=1)
    want = dense_attention(q, k, v, causal_mask(s, sep=sep))
    got = flash_attention(q, k, v, sep, 64, 64, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("s,sep,bq,bk", [(192, 100, 32, 32), (256, 180, 64, 64)])
def test_flash_sep_larger_than_block(s, sep, bq, bk):
    """Regression: sep > block_k (and > 2*block_q) — the prefix extends past
    the causal diagonal, so fwd/dq loop bounds must include prefix key
    blocks and dkv must start at q-block 0 for prefix key blocks."""
    q, k, v = _mk(s, seed=7)
    want = dense_attention(q, k, v, causal_mask(s, sep=sep))
    got = flash_attention(q, k, v, sep, bq, bk, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def loss_flash(q, k, v):
        return jnp.mean(flash_attention(q, k, v, sep, bq, bk, True) ** 2)

    def loss_dense(q, k, v):
        return jnp.mean(dense_attention(q, k, v, causal_mask(s, sep=sep)) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gd, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch at sep={sep}",
        )


def test_flash_backward_matches_dense():
    s = 128
    q, k, v = _mk(s, seed=2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, 0, 64, 64, True) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(dense_attention(q, k, v, causal_mask(s)) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gd, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


def test_fp16_never_routes_to_flash(monkeypatch):
    """Mosaic has no f16 lowering ('Unsupported type in mosaic dialect:
    f16', measured on-chip), so the --fp16 parity path must fall back to
    dense even when flash is forced (gpt.should_use_flash)."""
    from cogview_tpu.config import tiny_test
    from cogview_tpu.models import gpt

    def boom(*a, **k):
        raise AssertionError("flash_attention called")

    monkeypatch.setattr(gpt, "flash_attention", boom)
    cfg16 = tiny_test(pb_relax=False, use_flash_attention=True,
                      compute_dtype=jnp.float16)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg16)
    tokens = jnp.zeros((1, 24), jnp.int32)
    out = gpt.forward(params, cfg16, tokens)  # dense path, no raise
    assert np.isfinite(np.asarray(out, np.float32)).all()

    cfgbf = tiny_test(pb_relax=False, use_flash_attention=True)
    params = gpt.init_params(jax.random.PRNGKey(0), cfgbf)
    with pytest.raises(AssertionError, match="flash_attention called"):
        gpt.forward(params, cfgbf, tokens)


def test_pick_flash_blocks():
    """Auto block selection: minimal padded length, largest block wins
    ties (ops/flash_attention.pick_flash_blocks)."""
    from cogview_tpu.ops.flash_attention import pick_flash_blocks

    assert pick_flash_blocks(1089) == (128, 576)   # 1152 pad, 576 > 384
    assert pick_flash_blocks(1345) == (128, 704)   # 1408 pad, 704 > 128
    assert pick_flash_blocks(4224) == (128, 704)   # exact multiple (6x704)
    assert pick_flash_blocks(4096) == (128, 512)   # exact multiple
    assert pick_flash_blocks(128) == (128, 128)


@pytest.mark.parametrize("bq,bk", [(32, 64), (64, 32), (32, 96)])
def test_flash_backward_asymmetric_blocks(bq, bk):
    """bq != bk stresses the full/masked block-range bounds (r3 split:
    unmasked fast path for fully-visible blocks) in both bwd kernels."""
    s, sep = 200, 30
    q, k, v = _mk(s, seed=5)

    def loss_flash(q, k, v):
        return jnp.mean(flash_attention(q, k, v, sep, bq, bk, True) ** 2)

    def loss_dense(q, k, v):
        return jnp.mean(dense_attention(q, k, v, causal_mask(s, sep=sep)) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gd, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch at bq={bq},bk={bk}",
        )


def test_flash_backward_with_padding_and_sep():
    s, sep = 150, 20  # not a block multiple
    q, k, v = _mk(s, seed=3)

    def loss_flash(q, k, v):
        return jnp.mean(flash_attention(q, k, v, sep, 64, 64, True))

    def loss_dense(q, k, v):
        return jnp.mean(dense_attention(q, k, v, causal_mask(s, sep=sep)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def _dense_with_hash_dropout(q, k, v, mask, seed, rate):
    """dense_attention + the kernel's exact hash keep mask (the in-kernel
    dropout is defined per global (b,n,qpos,kpos) coordinate, so a dense
    computation can reproduce it bit-for-bit)."""
    import math

    from cogview_tpu.ops.flash_attention import dropout_keep_reference

    B, Sq, N, D = q.shape
    Sk = k.shape[1]
    scale = 1.0 / math.sqrt(D)
    scores = jnp.einsum("bqnd,bknd->bnqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(mask.astype(bool), scores, -10000.0)
    probs = jax.nn.softmax(scores, axis=-1)
    keep = jnp.stack([
        jnp.stack([dropout_keep_reference(seed, b, n, N, Sq, Sk, rate)
                   for n in range(N)])
        for b in range(B)
    ])
    probs = jnp.where(keep, probs / (1.0 - rate), 0.0)
    return jnp.einsum("bnqk,bknd->bqnd", probs, v,
                      preferred_element_type=jnp.float32)


@pytest.mark.parametrize("s,sep,rate", [(128, 0, 0.1), (150, 20, 0.4)])
def test_flash_dropout_matches_dense_hash(s, sep, rate):
    q, k, v = _mk(s, seed=11)
    want = _dense_with_hash_dropout(q, k, v, causal_mask(s, sep=sep), 123, rate)
    got = flash_attention(q, k, v, sep, 64, 64, True,
                          dropout_rate=rate, dropout_seed=123)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.slow
def test_flash_dropout_backward_matches_dense_hash():
    s, sep, rate = 128, 20, 0.25
    q, k, v = _mk(s, seed=12)

    def loss_flash(q, k, v):
        return jnp.mean(flash_attention(q, k, v, sep, 64, 64, True,
                                        dropout_rate=rate, dropout_seed=77) ** 2)

    def loss_dense(q, k, v):
        return jnp.mean(_dense_with_hash_dropout(
            q, k, v, causal_mask(s, sep=sep), 77, rate) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gd, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch with dropout",
        )


def test_flash_dropout_seed_behavior():
    s, rate = 96, 0.3
    q, k, v = _mk(s, seed=13)
    a = flash_attention(q, k, v, 0, 32, 32, True, dropout_rate=rate, dropout_seed=5)
    b = flash_attention(q, k, v, 0, 32, 32, True, dropout_rate=rate, dropout_seed=5)
    c = flash_attention(q, k, v, 0, 32, 32, True, dropout_rate=rate, dropout_seed=6)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-4
    # block-partitioning independence: same mask at different block sizes
    d = flash_attention(q, k, v, 0, 96, 32, True, dropout_rate=rate, dropout_seed=5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(d), atol=1e-5)
    # observed drop fraction ~ rate
    keepfrac = float(jnp.mean((np.asarray(a) != 0).astype(np.float32)))
    assert keepfrac > 0.1


@pytest.mark.slow
def test_model_forward_flash_with_dropout():
    """Training forward with flash + attention_dropout > 0 runs in-kernel
    dropout (finite, differs from the no-dropout output, deterministic per
    rng)."""
    from cogview_tpu.config import tiny_test
    from cogview_tpu.models import gpt

    cfg = tiny_test(pb_relax=False, attention_dropout=0.3,
                    use_flash_attention=True)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 128, (2, 40)))
    rng = jax.random.key(3, impl="rbg")
    out1 = gpt.forward(params, cfg, tokens, train=True, rng=rng)
    out2 = gpt.forward(params, cfg, tokens, train=True, rng=rng)
    base = gpt.forward(params, cfg, tokens)
    assert np.isfinite(np.asarray(out1)).all()
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.abs(np.asarray(out1) - np.asarray(base)).max() > 1e-4


def test_flash_auto_dispatch_by_seq_len():
    """use_flash_attention='auto' routes to flash iff S >= flash_min_seq;
    both routes agree on a causal forward."""
    from cogview_tpu.config import tiny_test
    from cogview_tpu.models import gpt

    cfg = tiny_test(pb_relax=False, flash_min_seq=16)  # auto by default
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray(np.random.RandomState(3).randint(0, 128, (2, 40)))
    auto = gpt.forward(params, cfg, tokens)  # S=40 >= 16 -> flash
    dense = gpt.forward(params, cfg.replace(use_flash_attention=False), tokens)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(dense), atol=2e-4)


def test_model_forward_with_flash_flag():
    """forward(use_flash_attention=True) == dense forward (causal, no
    dropout); exercises the in-model dispatch path (interpret on CPU)."""
    from cogview_tpu.config import tiny_test
    from cogview_tpu.models import gpt

    cfg = tiny_test(pb_relax=False)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 128, (2, 40)))
    want = gpt.forward(params, cfg, tokens)
    got = gpt.forward(params, cfg.replace(use_flash_attention=True), tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
