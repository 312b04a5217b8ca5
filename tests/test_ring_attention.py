"""Ring (context-parallel) attention: sequence sharded over a mesh axis.

Beyond-reference capability (the reference holds the full sequence on
every GPU and answers long contexts only with the pivot+window sparse
pattern, mpu/sparse_transformer.py:675-750).  Equivalence bar: identical
values to the unsharded dense path — including the exact -10000 mask
semantics and the counter-hash dropout keep pattern, which is defined
over GLOBAL (b, n, q, k) coordinates precisely so that any partitioning
reproduces it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from cogview_tpu.config import tiny_test
from cogview_tpu.models import gpt
from cogview_tpu.ops.attention import causal_mask, dense_attention
from cogview_tpu.ops.ring_attention import ring_attention_sharded

B, S, N, D = 2, 64, 8, 8


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.RandomState(0)
    return tuple(jnp.asarray(rng.randn(B, S, N, D), jnp.float32)
                 for _ in range(3))


def _mesh(*shape_axes):
    shape = tuple(n for n, _ in shape_axes)
    axes = tuple(a for _, a in shape_axes)
    return Mesh(np.array(jax.devices()).reshape(shape), axes)


@pytest.mark.parametrize("sep", [0, 17])
def test_ring_matches_dense(qkv, sep):
    q, k, v = qkv
    ref = np.asarray(dense_attention(q, k, v, causal_mask(S, sep=sep)))
    with jax.set_mesh(_mesh((8, "seq"))):
        out = np.asarray(jax.jit(lambda q, k, v: ring_attention_sharded(
            q, k, v, seq_axis="seq", n_shards=8, sep=sep))(q, k, v))
    assert np.abs(out - ref).max() < 2e-5


def test_ring_dropout_pattern_partitioning_independent(qkv):
    """The keep mask hashes global coordinates, so data-, head- and
    sequence-sharded runs all reproduce the unsharded dense mask."""
    q, k, v = qkv
    seed = jnp.uint32(98765)
    ref = np.asarray(dense_attention(
        q, k, v, causal_mask(S, sep=5),
        dropout_rate=0.1, dropout_seed=seed, train=True))

    with jax.set_mesh(_mesh((2, "data"), (4, "seq"))):
        out = np.asarray(jax.jit(lambda q, k, v, s: ring_attention_sharded(
            q, k, v, seq_axis="seq", n_shards=4, data_axis="data", sep=5,
            dropout_rate=0.1, dropout_seed=s, train=True))(q, k, v, seed))
    assert np.abs(out - ref).max() < 2e-5

    with jax.set_mesh(_mesh((2, "data"), (2, "seq"), (2, "model"))):
        out = np.asarray(jax.jit(lambda q, k, v, s: ring_attention_sharded(
            q, k, v, seq_axis="seq", n_shards=2, data_axis="data",
            head_axis="model", sep=5,
            dropout_rate=0.1, dropout_seed=s, train=True))(q, k, v, seed))
    assert np.abs(out - ref).max() < 2e-5


def test_ring_gradients_match_dense(qkv):
    q, k, v = qkv

    def loss_dense(q, k, v):
        o = dense_attention(q, k, v, causal_mask(S, sep=3))
        return jnp.sum(o * o)

    def loss_ring(q, k, v):
        o = ring_attention_sharded(q, k, v, seq_axis="seq", n_shards=8,
                                   sep=3)
        return jnp.sum(o * o)

    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    with jax.set_mesh(_mesh((8, "seq"))):
        gr = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
        gr = jax.tree.map(np.asarray, gr)
    for a, b in zip(gd, gr):
        assert np.abs(np.asarray(a) - b).max() < 5e-4


@pytest.mark.slow
def test_model_forward_and_grads_with_sp():
    """gpt.forward with cfg.sp_axis on a ('data','seq') mesh == the
    unsharded model: loss bit-comparable, every grad within fp32 noise —
    with dropout active and the remat layer scan on."""
    CFG = tiny_test(vocab_size=128, max_position_embeddings=64,
                    attention_dropout=0.1)
    cfg_sp = CFG.replace(sp_axis="seq", sp_num_shards=4,
                         sp_data_axis="data")
    params = gpt.init_params(jax.random.PRNGKey(0), CFG)
    tokens = jnp.asarray(
        np.random.RandomState(0).randint(0, 128, (2, 64)), jnp.int32)

    def loss(p, c):
        lg = gpt.forward(p, c, tokens, sep=5, train=True,
                         rng=jax.random.PRNGKey(7), remat=True)
        oh = jax.nn.one_hot(jnp.roll(tokens, -1, 1), 128)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(lg) * oh, -1))

    l_ref, g_ref = jax.value_and_grad(lambda p: loss(p, CFG))(params)
    with jax.set_mesh(_mesh((2, "data"), (4, "seq"))):
        l_sp, g_sp = jax.jit(
            jax.value_and_grad(lambda p: loss(p, cfg_sp)))(params)
        l_sp, g_sp = float(l_sp), jax.tree.map(np.asarray, g_sp)
    assert abs(float(l_ref) - l_sp) < 2e-5
    errs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), g_ref, g_sp)
    assert max(jax.tree.leaves(errs)) < 5e-4


@pytest.mark.slow
def test_fsdp_param_sharding_matches_replicated():
    """gpt_param_specs(fsdp_axis='data') — ZeRO-3 as metadata: same
    losses and post-step params as the TP-only sharding, and each weight
    physically splits over data x model (1/8 per chip on 4x2)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cogview_tpu.parallel import create_mesh
    from cogview_tpu.parallel.sharding import gpt_param_specs, shard_params
    from cogview_tpu.training.optim import make_optimizer
    from cogview_tpu.training.train_loop import (
        init_train_state, make_train_step)

    CFG = tiny_test(vocab_size=128, max_position_embeddings=64)
    tx, _ = make_optimizer(gpt.init_params(jax.random.PRNGKey(0), CFG),
                           lr=1e-3, warmup_iter=1, num_iters=10)
    text = np.random.RandomState(0).randint(0, 128, (8, 65)).astype(np.int32)
    mesh = create_mesh(model_parallel=2, data_parallel=4)

    def run(specs):
        with jax.set_mesh(mesh):
            p = shard_params(
                gpt.init_params(jax.random.PRNGKey(0), CFG), mesh, specs)
            st = init_train_state(p, tx)
            step = make_train_step(CFG, tx, img_vocab=64)
            batch = {
                "text": jax.device_put(
                    text, NamedSharding(mesh, P("data", None))),
                "loss_mask": jax.device_put(
                    np.ones((8, 65), np.float32),
                    NamedSharding(mesh, P("data", None))),
            }
            losses = []
            for _ in range(3):
                st, m = step(st, batch, jax.random.PRNGKey(5))
                losses.append(float(m["lm_loss"]))
            return losses, st["params"]

    l_ref, _ = run(gpt_param_specs())
    l_fsdp, p_fsdp = run(gpt_param_specs(fsdp_axis="data"))
    assert np.allclose(l_ref, l_fsdp, atol=2e-5), (l_ref, l_fsdp)
    w = p_fsdp["layers"]["mlp_in"]["w"]
    (local,) = {tuple(s.data.shape) for s in w.addressable_shards}
    assert local == (w.shape[0], w.shape[1] // 4, w.shape[2] // 2), (
        local, w.shape)  # data x model split is physical, not replicated
