"""Generation under a tensor-parallel mesh == single-device (greedy)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-step sharded decode parity (~90s)

import jax
import jax.numpy as jnp

from cogview_tpu.config import tiny_test
from cogview_tpu.generation.sampling import SamplingParams, compile_template, filling_sequence
from cogview_tpu.models import gpt
from cogview_tpu.parallel import create_mesh, gpt_param_specs, shard_params
from cogview_tpu.tokenization.unified import FakeImageTokenizer, UnifiedTokenizer


class TinyTxt:
    num_tokens = 64

    def encode(self, s):
        return [ord(c) % 64 for c in s]

    def decode(self, ids):
        return "x" * len(list(ids))


def test_filling_sequence_sharded_matches_greedy(eight_devices):
    cfg = tiny_test(pb_relax=False)  # heads=8 shard over model=4
    tok = UnifiedTokenizer(img_tokenizer=FakeImageTokenizer(32), txt_tokenizer=TinyTxt())
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    seq = [tok["[ROI1]"], 40, 50, tok["[BASE]"], tok["[BOI1]"]] + [-1] * 12
    tpl = compile_template(seq, tok, padded_vocab=cfg.vocab_size)
    sp = SamplingParams(temperature=1e-6, top_k=1, seed=0)  # greedy

    want, _ = filling_sequence(params, cfg, tpl, 2, sp)
    want = np.asarray(want)

    mesh = create_mesh(model_parallel=4, data_parallel=2)
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh, gpt_param_specs())
        got, _ = filling_sequence(sharded, cfg, tpl, 2, sp)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_quantized_decode_sharded_over_data_axis(eight_devices):
    """cfg.decode_shard_axis='data': the int8-cache decode kernel runs per
    DP shard (shard_map over the ambient mesh) and matches the unsharded
    decode bit-for-bit — batch rows attend only to their own cache."""
    cfg = tiny_test(pb_relax=False, compute_dtype=jnp.float32,
                    kv_cache_dtype="int8")
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, S, ctx = 8, 18, 10
    tokens = jnp.asarray(rng.randint(0, 128, (B, S)).astype(np.int32))
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))

    def decode_all(cfg_, params_, toks):
        cache = gpt.init_cache(cfg_, B, S)
        lg, cache = gpt.forward_with_cache(
            params_, cfg_, toks[:, :ctx], pos[:, :ctx], cache, jnp.int32(0))
        outs = [np.asarray(lg)]
        for t in range(ctx, S):
            lg, cache = gpt.forward_with_cache(
                params_, cfg_, toks[:, t:t + 1], pos[:, t:t + 1], cache,
                jnp.int32(t))
            outs.append(np.asarray(lg))
        return np.concatenate(outs, axis=1)

    want = decode_all(cfg, params, tokens)

    mesh = create_mesh(model_parallel=1, data_parallel=8)
    scfg = cfg.replace(decode_shard_axis="data")
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh, gpt_param_specs())
        from jax.sharding import NamedSharding, PartitionSpec as P
        stoks = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
        got = decode_all(scfg, sharded, stoks)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("kvdt", ["int8", "int4"])
def test_quantized_decode_sharded_dp_and_tp(eight_devices, kvdt):
    """decode_shard_axis='data' + decode_head_axis='model' on a 4x2 mesh:
    the quantized decode kernels (int8 AND the packed-nibble int4 flavor)
    run per (DP, TP) shard — batch rows over data, heads over model — and
    match the unsharded decode bit-for-bit (same quantization both
    sides)."""
    cfg = tiny_test(pb_relax=False, compute_dtype=jnp.float32,
                    kv_cache_dtype=kvdt)  # 8 heads -> 2 per model shard
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    B, S, ctx = 4, 18, 10
    tokens = jnp.asarray(rng.randint(0, 128, (B, S)).astype(np.int32))
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))

    def decode_all(cfg_, params_, toks):
        cache = gpt.init_cache(cfg_, B, S)
        lg, cache = gpt.forward_with_cache(
            params_, cfg_, toks[:, :ctx], pos[:, :ctx], cache, jnp.int32(0))
        outs = [np.asarray(lg)]
        for t in range(ctx, S):
            lg, cache = gpt.forward_with_cache(
                params_, cfg_, toks[:, t:t + 1], pos[:, t:t + 1], cache,
                jnp.int32(t))
            outs.append(np.asarray(lg))
        return np.concatenate(outs, axis=1)

    want = decode_all(cfg, params, tokens)

    mesh = create_mesh(model_parallel=4, data_parallel=2)
    scfg = cfg.replace(decode_shard_axis="data", decode_head_axis="model")
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh, gpt_param_specs())
        from jax.sharding import NamedSharding, PartitionSpec as P
        stoks = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
        got = decode_all(scfg, sharded, stoks)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
