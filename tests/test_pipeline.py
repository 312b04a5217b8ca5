"""Pipeline parallelism (GPipe over a 'pipe' mesh axis).

Beyond-reference capability (the reference scales only DP x TP).  The
stage decomposition is the model's own [L, ...] stacked-param layout
sharded on dim 0; activations hop stages via ppermute.  Equivalence bar:
logits/losses match the unpipelined model (dropout off — pipeline
microbatches intentionally perturb per-microbatch dropout seeds, see
parallel/pipeline.py docstring).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cogview_tpu.config import tiny_test
from cogview_tpu.models import gpt
from cogview_tpu.parallel.sharding import gpt_param_specs, shard_params

CFG = tiny_test(num_layers=4, vocab_size=128, max_position_embeddings=64)


def _mesh(*shape_axes):
    shape = tuple(n for n, _ in shape_axes)
    axes = tuple(a for _, a in shape_axes)
    return Mesh(np.array(jax.devices()).reshape(shape), axes)


@pytest.fixture(scope="module")
def params():
    return gpt.init_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def tokens():
    return jnp.asarray(
        np.random.RandomState(0).randint(0, 128, (8, 64)), jnp.int32)


def test_pp_forward_matches(params, tokens):
    ref = np.asarray(gpt.forward(params, CFG, tokens, sep=5))
    cfg_pp = CFG.replace(pp_axis="pipe", pp_num_stages=4, pp_microbatches=4)
    with jax.set_mesh(_mesh((2, "data"), (4, "pipe"))):
        out = np.asarray(jax.jit(
            lambda p, t: gpt.forward(p, cfg_pp, t, sep=5))(params, tokens))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 2e-5


def test_pp_grads_match(params, tokens):
    """Backward through the tick scan (remat on) == unpipelined grads;
    also regression-guards the warmup-NaN case: garbage warmup
    activations must stay finite through the PB-relax layernorm."""
    def loss(p, c):
        lg = gpt.forward(p, c, tokens, sep=5, train=True,
                         rng=jax.random.PRNGKey(7), remat=True)
        oh = jax.nn.one_hot(jnp.roll(tokens, -1, 1), 128)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(lg) * oh, -1))

    cfg_pp = CFG.replace(pp_axis="pipe", pp_num_stages=4, pp_microbatches=2)
    l_ref, g_ref = jax.value_and_grad(lambda p: loss(p, CFG))(params)
    with jax.set_mesh(_mesh((2, "data"), (4, "pipe"))):
        l_pp, g_pp = jax.jit(
            jax.value_and_grad(lambda p: loss(p, cfg_pp)))(params)
        l_pp, g_pp = float(l_pp), jax.tree.map(np.asarray, g_pp)
    assert abs(float(l_ref) - l_pp) < 2e-5
    errs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), g_ref, g_pp)
    assert max(jax.tree.leaves(errs)) < 5e-4


@pytest.mark.slow
def test_pp_train_step_dp_pp_tp(tokens):
    """Full train step on ('data','pipe','model'): losses track the
    unsharded run over 3 optimizer steps, and each stage physically
    holds num_layers/stages layers (param shard check)."""
    from cogview_tpu.training.optim import make_optimizer
    from cogview_tpu.training.train_loop import (
        init_train_state, make_train_step)

    cfg_pp = CFG.replace(pp_axis="pipe", pp_num_stages=2, pp_microbatches=4)
    mesh = _mesh((2, "data"), (2, "pipe"), (2, "model"))
    tx, _ = make_optimizer(gpt.init_params(jax.random.PRNGKey(0), CFG),
                           lr=1e-3, warmup_iter=1, num_iters=10)
    text = np.random.RandomState(0).randint(0, 128, (8, 65)).astype(np.int32)

    def run(cfg, specs):
        with jax.set_mesh(mesh):
            p = shard_params(
                gpt.init_params(jax.random.PRNGKey(0), CFG), mesh, specs)
            st = init_train_state(p, tx)
            step = make_train_step(cfg, tx, img_vocab=64)
            batch = {
                "text": jax.device_put(
                    text, NamedSharding(mesh, P("data", None))),
                "loss_mask": jax.device_put(
                    np.ones((8, 65), np.float32),
                    NamedSharding(mesh, P("data", None))),
            }
            ls = []
            for _ in range(3):
                st, m = step(st, batch, jax.random.PRNGKey(5))
                ls.append(float(m["lm_loss"]))
            return ls, st["params"]

    l_ref, _ = run(CFG, gpt_param_specs())
    l_pp, p_pp = run(cfg_pp, gpt_param_specs(pp_axis="pipe"))
    assert np.allclose(l_ref, l_pp, atol=3e-5), (l_ref, l_pp)
    w = p_pp["layers"]["qkv"]["w"]
    (local,) = {tuple(s.data.shape) for s in w.addressable_shards}
    assert local[0] == w.shape[0] // 2  # layers split across stages


def _sparse_spec(cfg, tokens, num_pivot=32, img_vocab=100):
    from cogview_tpu.ops.sparse_attention import (
        build_rmask, gather_pivot_mask, sample_pivots)
    S = tokens.shape[1]
    pivot_idx = sample_pivots(
        jax.random.key(2, impl="rbg"), tokens, num_pivot, img_vocab)
    rmask = jnp.asarray(
        build_rmask(S, cfg.query_window, cfg.key_window_times))
    return gpt.SparseSpec(pivot_idx, gather_pivot_mask(rmask, pivot_idx),
                          cfg.query_window, cfg.key_window_times)


def test_pp_sparse_forward_matches(params, tokens):
    """Pivot+window sparse attention rides the pipeline: the per-sample
    pivot arrays enter gpipe_scan as mb_aux and each stage slices the
    chunk of the microbatch it is computing (the reference's flagship
    trains sparse — text2image.sh:39-41 — so a pipelined 48L model must
    not have to give it up)."""
    cfg = CFG.replace(query_window=16, key_window_times=2)
    spec = _sparse_spec(cfg, tokens)
    ref = np.asarray(gpt.forward(params, cfg, tokens, sparse=spec))
    cfg_pp = cfg.replace(pp_axis="pipe", pp_num_stages=4, pp_microbatches=4)
    with jax.set_mesh(_mesh((2, "data"), (4, "pipe"))):
        out = np.asarray(jax.jit(
            lambda p, t: gpt.forward(p, cfg_pp, t, sparse=spec))(
                params, tokens))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 2e-5


def test_pp_sparse_grads_match(params, tokens):
    cfg = CFG.replace(query_window=16, key_window_times=2)
    spec = _sparse_spec(cfg, tokens)

    def loss(p, c):
        lg = gpt.forward(p, c, tokens, sparse=spec, train=True,
                         rng=jax.random.PRNGKey(7), remat=True)
        oh = jax.nn.one_hot(jnp.roll(tokens, -1, 1), 128)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(lg) * oh, -1))

    cfg_pp = cfg.replace(pp_axis="pipe", pp_num_stages=4, pp_microbatches=2)
    l_ref, g_ref = jax.value_and_grad(lambda p: loss(p, cfg))(params)
    with jax.set_mesh(_mesh((2, "data"), (4, "pipe"))):
        l_pp, g_pp = jax.jit(
            jax.value_and_grad(lambda p: loss(p, cfg_pp)))(params)
        l_pp, g_pp = float(l_pp), jax.tree.map(np.asarray, g_pp)
    assert abs(float(l_ref) - l_pp) < 2e-5
    errs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), g_ref, g_pp)
    assert max(jax.tree.leaves(errs)) < 5e-4


def test_pp_bf16_compute_grads_finite(params, tokens):
    """Regression guard for the jax-0.9/XLA-CPU check failure ('Invalid
    binary instruction opcode copy') when transposing a replicated bf16
    shard_map input: the pipeline keeps its boundary in f32."""
    cfg = CFG.replace(pp_axis="pipe", pp_num_stages=4, pp_microbatches=2,
                      compute_dtype=jnp.bfloat16)

    def loss(p):
        lg = gpt.forward(p, cfg, tokens, sep=5, train=True,
                         rng=jax.random.PRNGKey(7), remat=True)
        return jnp.mean(lg.astype(jnp.float32) ** 2)

    with jax.set_mesh(_mesh((2, "data"), (4, "pipe"))):
        l, g = jax.jit(jax.value_and_grad(loss))(params)
        l = float(l)
        g = jax.tree.map(np.asarray, g)
    assert np.isfinite(l)
    assert all(np.isfinite(a).all() for a in jax.tree.leaves(g))
