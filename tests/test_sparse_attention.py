"""Pivot+window sparse attention: the lifted equivalence test.

The reference's in-file test (mpu/sparse_transformer.py:753-821) only
*printed* the sparse-vs-dense deltas; here they are asserted:

* with the pivot importance bias removed, sparse attention is EXACTLY
  dense attention under the union mask (window band + causal pivot
  columns);
* gradients agree too;
* the default +log(s/num_pivot) bias reproduces the reference behavior
  (changes outputs, bounded deviation).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cogview_tpu.ops.attention import dense_attention
from cogview_tpu.ops.sparse_attention import (
    build_rmask,
    chunk_windows,
    gather_pivot_mask,
    pivot_window_attention,
    sample_pivots,
    sparse_attention_inference,
    window_mask,
)

B, N, D = 2, 4, 16
S, W, TIMES = 256 + 64, 64, 2  # s % w == 0
P = 96


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.RandomState(0)
    mk = lambda: jnp.asarray(rng.rand(B, S, N, D).astype(np.float32))
    return mk(), mk(), mk()


@pytest.fixture(scope="module")
def pivots():
    """text positions 0..31 / 0..9 + random image positions (per sample)."""
    rng = np.random.RandomState(1)
    idx = []
    for txt_len in (32, 10):
        img = rng.choice(np.arange(txt_len, S - TIMES * W), P - txt_len, replace=False)
        idx.append(np.sort(np.concatenate([np.arange(txt_len), img])))
    return jnp.asarray(np.stack(idx))


def dense_union_mask(pivot_idx: np.ndarray) -> np.ndarray:
    """real_mask of the reference test: (1 - rmask) | pivot columns, tril."""
    rmask = build_rmask(S, W, TIMES)
    m = np.broadcast_to(~rmask, (B, S, S)).copy()
    for i in range(B):
        m[i][:, np.asarray(pivot_idx[i])] = True
    tril = np.tril(np.ones((S, S), bool))
    return (m & tril)[:, None]  # [B,1,S,S]


def test_window_chunking(qkv):
    k = qkv[1]
    wins = chunk_windows(k, W, TIMES)
    G = S // W
    assert wins.shape == (B, G, TIMES * W, N, D)
    # chunk g ends at key (g+1)*w - 1
    np.testing.assert_array_equal(
        np.asarray(wins[:, 2, -W:]), np.asarray(k[:, 2 * W : 3 * W])
    )
    # leading chunks are left-padded with zeros
    assert float(jnp.abs(wins[:, 0, : (TIMES - 1) * W]).max()) == 0.0


def test_sparse_equals_dense_without_bias(qkv, pivots):
    q, k, v = qkv
    rmask = jnp.asarray(build_rmask(S, W, TIMES))
    pmask = gather_pivot_mask(rmask, pivots)
    out_sparse = pivot_window_attention(
        q, k, v, pivots, pmask, W, TIMES, pivot_bias=0.0
    )
    out_dense = dense_attention(q, k, v, jnp.asarray(dense_union_mask(pivots)))
    np.testing.assert_allclose(
        np.asarray(out_sparse), np.asarray(out_dense), atol=2e-5, rtol=1e-4
    )


@pytest.mark.slow
def test_sparse_gradients_match_dense(qkv, pivots):
    q, k, v = qkv
    rmask = jnp.asarray(build_rmask(S, W, TIMES))
    pmask = gather_pivot_mask(rmask, pivots)
    dmask = jnp.asarray(dense_union_mask(pivots))

    g_sparse = jax.grad(
        lambda q, k, v: pivot_window_attention(
            q, k, v, pivots, pmask, W, TIMES, pivot_bias=0.0
        ).mean(),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_dense = jax.grad(
        lambda q, k, v: dense_attention(q, k, v, dmask).mean(), argnums=(0, 1, 2)
    )(q, k, v)
    for gs, gd in zip(g_sparse, g_dense):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), atol=3e-6)


def test_pivot_bias_reweights(qkv, pivots):
    q, k, v = qkv
    rmask = jnp.asarray(build_rmask(S, W, TIMES))
    pmask = gather_pivot_mask(rmask, pivots)
    a = pivot_window_attention(q, k, v, pivots, pmask, W, TIMES)  # default bias
    b = pivot_window_attention(q, k, v, pivots, pmask, W, TIMES, pivot_bias=0.0)
    diff = float(jnp.abs(a - b).max())
    assert 0 < diff < 1.0  # reweighting acts but stays bounded


def test_inference_gather_matches_dense_tail(qkv, pivots):
    """sparse_attention_inference on the trailing block == dense attention
    restricted to pivot+window keys (reference commented check, :786-794)."""
    q, k, v = qkv
    sq = 1
    window_idx = jnp.broadcast_to(jnp.arange(S - TIMES * W, S), (B, TIMES * W))
    pw_idx = jnp.concatenate([pivots, window_idx], axis=-1)
    out = sparse_attention_inference(q[:, -sq:], k, v, pw_idx)
    assert out.shape == (B, sq, N, D)

    # dense reference over exactly those keys
    kk = jnp.take_along_axis(k, pw_idx[:, :, None, None], axis=1)
    vv = jnp.take_along_axis(v, pw_idx[:, :, None, None], axis=1)
    sc = jnp.einsum("bqnd,bpnd->bnqp", q[:, -sq:] / np.sqrt(D), kk)
    probs = jax.nn.softmax(sc, axis=-1)
    want = jnp.einsum("bnqp,bpnd->bqnd", probs, vv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


def test_sample_pivots_includes_all_text():
    tokens = np.full((2, S), 5, np.int32)  # image codes
    tokens[0, :40] = 9000  # text
    tokens[1, :7] = 9000
    idx = sample_pivots(jax.random.PRNGKey(0), jnp.asarray(tokens), P, img_vocab=8192)
    assert idx.shape == (2, P)
    got0 = set(np.asarray(idx[0]).tolist())
    assert set(range(40)) <= got0
    assert len(got0) == P  # distinct
    got1 = set(np.asarray(idx[1]).tolist())
    assert set(range(7)) <= got1


@pytest.mark.slow
def test_sparse_lm_loss_runs():
    """End-to-end: lm_loss(is_sparse=True) on a tiny model is finite."""
    from cogview_tpu.config import tiny_test
    from cogview_tpu.models import gpt
    from cogview_tpu.training.losses import lm_loss

    cfg = tiny_test(
        vocab_size=128, max_position_embeddings=72,
        query_window=8, key_window_times=2, num_pivot=16,
    )
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    batch = {
        "text": rng.randint(0, 120, size=(2, 65)).astype(np.int32),
        "loss_mask": np.ones((2, 65), np.float32),
    }
    loss, metrics = lm_loss(
        params, cfg, batch, img_vocab=32, train=False, remat=False,
        is_sparse=True, sparse_rng=jax.random.PRNGKey(1),
    )
    assert np.isfinite(float(loss))
