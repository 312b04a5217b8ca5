"""GPT forward parity and sharding equivalence tests.

Gates (SURVEY.md §7.2 step 2): logits match the reference torch GPT2Model
to fp32 tolerance; mesh-sharded (mp=4 / dp=2) execution is numerically
identical to single-device; KV-cached decode equals the full forward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cogview_tpu.config import tiny_test
from cogview_tpu.models import gpt
from cogview_tpu.models.convert import gpt_from_state_dict
from cogview_tpu.parallel import create_mesh, gpt_param_specs, shard_params

torch = pytest.importorskip("torch")

from oracle_utils import make_reference_gpt  # noqa: E402

CFG = tiny_test(num_heads=4, max_position_embeddings=64)


@pytest.fixture(scope="module")
def oracle():
    return make_reference_gpt(
        num_layers=CFG.num_layers, vocab=CFG.vocab_size,
        hidden=CFG.hidden_size, heads=CFG.num_heads, max_seq=64,
    )


@pytest.fixture(scope="module")
def params(oracle):
    p = gpt_from_state_dict(oracle.state_dict(), CFG.num_layers, CFG.num_heads)
    return jax.tree.map(jnp.asarray, p)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(0)
    return rng.randint(0, CFG.vocab_size, size=(2, 24)).astype(np.int32)


def _oracle_logits(oracle, tokens):
    B, S = tokens.shape
    pos = torch.arange(S).unsqueeze(0).expand(B, -1)
    mask = torch.tril(torch.ones(1, 1, S, S))
    with torch.no_grad():
        out = oracle(torch.from_numpy(tokens).long(), pos, mask, None, None, 0)
    return out[0].numpy()


def test_logits_match_reference(oracle, params, batch):
    ref = _oracle_logits(oracle, batch)
    got = np.asarray(gpt.forward(params, CFG, jnp.asarray(batch)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_remat_identical(params, batch):
    a = gpt.forward(params, CFG, jnp.asarray(batch), remat=False)
    b = gpt.forward(params, CFG, jnp.asarray(batch), remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_prefix_lm_sep_mask(oracle, params, batch):
    """sep>0 gives bidirectional visibility of the first sep positions
    (build_mask_matrix, sparse_transformer.py:482-489)."""
    sep = 7
    B, S = batch.shape
    pos = torch.arange(S).unsqueeze(0).expand(B, -1)
    m = torch.ones(1, S, S)
    m = torch.tril(m)
    m[0, :, :sep] = 1
    with torch.no_grad():
        ref = oracle(torch.from_numpy(batch).long(), pos, m.unsqueeze(1), None, None, 0)[0].numpy()
    got = np.asarray(gpt.forward(params, CFG, jnp.asarray(batch), sep=sep))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_kv_cache_equals_full_forward(params, batch):
    """prefill(ctx) + per-token decode == one full forward (fp32).

    Exact equivalence holds with pb_relax=False (per-token LN); the
    pb-relaxed mode only differs through the per-block eps correction and
    is covered loosely in test_kv_cache_pb_relax_close."""
    cfg = CFG.replace(pb_relax=False)
    tokens = jnp.asarray(batch)
    B, S = tokens.shape
    ctx = 10
    full = gpt.forward(params, cfg, tokens)

    cache = gpt.init_cache(cfg, B, S, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    logits_pre, cache = gpt.forward_with_cache(
        params, cfg, tokens[:, :ctx], pos[:, :ctx], cache, jnp.int32(0)
    )
    np.testing.assert_allclose(
        np.asarray(logits_pre), np.asarray(full[:, :ctx]), atol=1e-4, rtol=1e-4
    )
    step_fn = jax.jit(
        lambda p, tk, ps, c, i: gpt.forward_with_cache(p, cfg, tk, ps, c, i)
    )
    for t in range(ctx, S):
        step_logits, cache = step_fn(
            params, tokens[:, t : t + 1], pos[:, t : t + 1], cache, jnp.int32(t)
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full[:, t]),
            atol=1e-4, rtol=1e-4,
        )


def test_kv_cache_pb_relax_close(params, batch):
    """With the faithful PB-relax prescale, cached decode tracks the full
    forward to the eps-correction level (same deviation the reference's own
    mems path exhibits)."""
    tokens = jnp.asarray(batch)
    B, S = tokens.shape
    full = gpt.forward(params, CFG, tokens)
    cache = gpt.init_cache(CFG, B, S, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    logits, cache = gpt.forward_with_cache(
        params, CFG, tokens[:, :20], pos[:, :20], cache, jnp.int32(0)
    )
    step, cache = gpt.forward_with_cache(
        params, CFG, tokens[:, 20:21], pos[:, 20:21], cache, jnp.int32(20)
    )
    probs_full = jax.nn.softmax(full[:, 20])
    probs_step = jax.nn.softmax(step[:, 0])
    assert float(jnp.max(jnp.abs(probs_full - probs_step))) < 5e-2


@pytest.mark.slow
def test_block_decode_equals_full(params, batch):
    """multi-token decode blocks (the magnify/i2t pattern) also match."""
    cfg = CFG.replace(pb_relax=False)
    tokens = jnp.asarray(batch)
    B, S = tokens.shape
    full = gpt.forward(params, cfg, tokens)
    cache = gpt.init_cache(cfg, B, S, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    splits = [0, 5, 6, 14, S]
    for a, b in zip(splits[:-1], splits[1:]):
        logits, cache = gpt.forward_with_cache(
            params, cfg, tokens[:, a:b], pos[:, a:b], cache, jnp.int32(a)
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, a:b]), atol=1e-4, rtol=1e-4
        )


def test_model_parallel_equivalence(params, batch, eight_devices):
    """mp=4 x dp=2 sharded forward == unsharded forward."""
    mesh = create_mesh(model_parallel=4, data_parallel=2)
    specs = gpt_param_specs()
    sharded = shard_params(params, mesh, specs)
    tokens = jax.device_put(
        jnp.asarray(batch), NamedSharding(mesh, P("data", None))
    )

    @jax.jit
    def run(p, t):
        return gpt.forward(p, CFG, t)

    with jax.set_mesh(mesh):
        got = np.asarray(run(sharded, tokens))
    want = np.asarray(gpt.forward(params, CFG, jnp.asarray(batch)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_training_mems_match_reference(params):
    """max_memory_length > 0 across two segments: logits and the rolling
    detached memory window bit-track the torch oracle
    (sparse_transformer.py:471-626).  Segment 2 attends over LN(mem)
    keys/values with full memory visibility."""
    max_mem = 16
    oracle_m = make_reference_gpt(
        num_layers=CFG.num_layers, vocab=CFG.vocab_size, hidden=CFG.hidden_size,
        heads=CFG.num_heads, max_seq=64, max_memory_length=max_mem,
    )
    # torch.manual_seed(0) inside the factory -> identical weights to the
    # `params` fixture's source oracle
    rng = np.random.RandomState(7)
    t1 = rng.randint(0, CFG.vocab_size, size=(2, 12)).astype(np.int32)
    t2 = rng.randint(0, CFG.vocab_size, size=(2, 12)).astype(np.int32)

    def opos(start, n):
        return torch.arange(start, start + n).unsqueeze(0).expand(2, -1)

    with torch.no_grad():
        out1 = oracle_m(torch.from_numpy(t1).long(), opos(0, 12), 0, None, None, 0)
        ref_l1, ref_mems1 = out1[0].numpy(), list(out1[1:])
        out2 = oracle_m(torch.from_numpy(t2).long(), opos(12, 12), 0, None,
                        None, 0, *ref_mems1)
        ref_l2, ref_mems2 = out2[0].numpy(), list(out2[1:])

    l1, mems1 = gpt.forward_with_mems(params, CFG, jnp.asarray(t1),
                                      max_memory_length=max_mem)
    pos2 = jnp.broadcast_to(jnp.arange(12, 24, dtype=jnp.int32), (2, 12))
    l2, mems2 = gpt.forward_with_mems(params, CFG, jnp.asarray(t2), mems1,
                                      position_ids=pos2,
                                      max_memory_length=max_mem)

    np.testing.assert_allclose(np.asarray(l1), ref_l1, atol=2e-4, rtol=1e-4)
    assert mems1.shape == (CFG.num_layers + 1, 2, 12, CFG.hidden_size)
    for i, rm in enumerate(ref_mems1):
        np.testing.assert_allclose(np.asarray(mems1[i]), rm.numpy(),
                                   atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(l2), ref_l2, atol=2e-4, rtol=1e-4)
    # rolling window capped at max_mem: 12 + 12 -> 16
    assert mems2.shape == (CFG.num_layers + 1, 2, max_mem, CFG.hidden_size)
    for i, rm in enumerate(ref_mems2):
        np.testing.assert_allclose(np.asarray(mems2[i]), rm.numpy(),
                                   atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_mems_gradients_stop_at_window():
    """new_mems are detached (reference update_mems runs under no_grad):
    no gradient flows from segment-2 loss into segment-1 activations via
    the memory, but parameters still get segment-2 gradients."""
    cfg = tiny_test(num_heads=4, max_position_embeddings=64)
    p = gpt.init_params(jax.random.PRNGKey(0), cfg)
    t1 = jnp.asarray(np.random.RandomState(0).randint(0, cfg.vocab_size, (1, 8)))
    t2 = jnp.asarray(np.random.RandomState(1).randint(0, cfg.vocab_size, (1, 8)))

    def loss(params):
        _, mems = gpt.forward_with_mems(params, cfg, t1, max_memory_length=8)
        logits, _ = gpt.forward_with_mems(params, cfg, t2, mems,
                                          max_memory_length=8)
        return jnp.sum(logits ** 2)

    g = jax.grad(loss)(p)
    assert np.isfinite(np.asarray(g["embed"]["word"])).all()
    assert float(jnp.abs(g["embed"]["word"]).max()) > 0


def test_vocab_padding_helper():
    from cogview_tpu.config import pad_vocab_size

    assert pad_vocab_size(58219, 1) == 58240  # SURVEY §2.4
    assert pad_vocab_size(58219, 2) == 58368
    assert pad_vocab_size(128, 1) == 128


@pytest.mark.slow
def test_attention_dropout_active_on_dense_and_sparse_paths():
    """Regression (round-2 hash-PRNG migration dropped dropout_rate at two
    call sites): with attention_dropout > 0 a TRAIN forward must differ
    from eval on the dense path and on the pivot+window sparse path, and
    be reproducible for the same rng."""
    from cogview_tpu.config import tiny_test
    from cogview_tpu.models import gpt

    cfg = tiny_test(attention_dropout=0.9, output_dropout=0.0,
                    embedding_dropout=0.0, query_window=4,
                    key_window_times=2, num_pivot=4)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 120, (2, 16)))
    rng = jax.random.key(1, impl="rbg")

    eval_out = np.asarray(gpt.forward(params, cfg, tokens))
    train_out = np.asarray(gpt.forward(params, cfg, tokens,
                                       train=True, rng=rng))
    train_out2 = np.asarray(gpt.forward(params, cfg, tokens,
                                        train=True, rng=rng))
    assert np.abs(train_out - eval_out).max() > 1e-3, \
        "dense attention dropout is not being applied"
    np.testing.assert_array_equal(train_out, train_out2)

    from cogview_tpu.ops.sparse_attention import (
        build_rmask, gather_pivot_mask, sample_pivots)
    S = tokens.shape[1]
    pivot_idx = sample_pivots(
        jax.random.key(2, impl="rbg"), tokens, cfg.num_pivot, 32)
    rmask = jnp.asarray(build_rmask(S, cfg.query_window, cfg.key_window_times))
    spec = gpt.SparseSpec(pivot_idx, gather_pivot_mask(rmask, pivot_idx),
                          cfg.query_window, cfg.key_window_times)
    sp_eval = np.asarray(gpt.forward(params, cfg, tokens, sparse=spec))
    sp_train = np.asarray(gpt.forward(params, cfg, tokens, sparse=spec,
                                      train=True, rng=rng))
    assert np.abs(sp_train - sp_eval).max() > 1e-3, \
        "sparse attention dropout is not being applied"


@pytest.mark.slow
def test_logits_from_slices_exactly():
    """forward(logits_from=t) == forward()[:, t:] (drives the caption-
    scoring fast path, which projects only the text tail); and
    inverse_prompt_score over the sliced path equals the full-logits
    computation."""
    from cogview_tpu.config import tiny_test
    from cogview_tpu.generation.scoring import inverse_prompt_score
    from cogview_tpu.models import gpt

    cfg = tiny_test(max_position_embeddings=48)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 120, (2, 40)))
    full = np.asarray(gpt.forward(params, cfg, tokens))
    tail = np.asarray(gpt.forward(params, cfg, tokens, logits_from=25))
    np.testing.assert_allclose(tail, full[:, 25:], rtol=1e-6, atol=1e-6)

    botext, img_vocab = 20, 32
    got = np.asarray(inverse_prompt_score(
        params, cfg, tokens, img_vocab=img_vocab, botext=botext))
    lg = full.copy()
    lg[..., :img_vocab] = -np.inf
    lp = lg - np.log(np.exp(lg - lg.max(-1, keepdims=True)).sum(-1, keepdims=True)) - lg.max(-1, keepdims=True)
    want = np.take_along_axis(
        lp[:, botext:-1], np.asarray(tokens)[:, botext + 1:, None], axis=-1
    )[..., 0].sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
