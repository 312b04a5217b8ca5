"""Generation under a tensor-parallel mesh == single-device (greedy)."""

import numpy as np
import pytest

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
