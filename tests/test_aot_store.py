"""AOT executable store: serve/generate restart skips trace+lower+compile.

The store (utils/aot.ProgramStore) snapshots loaded XLA executables to
disk; a fresh ProgramStore instance (standing in for a restarted process)
must run the filling program from the serialized artifact and produce
bit-identical samples.
"""

import os
import pickle

import numpy as np
import pytest

import jax

from cogview_tpu.config import tiny_test
from cogview_tpu.generation.sampling import (
    SamplingParams,
    compile_template,
    filling_sequence,
    filling_sequence_aot,
)
from cogview_tpu.models import gpt
from cogview_tpu.tokenization.unified import FakeImageTokenizer, UnifiedTokenizer
from cogview_tpu.utils.aot import ProgramStore, program_key


class TinyTextTok:
    num_tokens = 64

    def encode(self, s):
        return [ord(c) % 64 for c in s]

    def decode(self, ids):
        return "".join(chr(97 + (i % 26)) for i in ids)


CFG = tiny_test()


@pytest.fixture(scope="module")
def tok():
    return UnifiedTokenizer(
        img_tokenizer=FakeImageTokenizer(32), txt_tokenizer=TinyTextTok()
    )


@pytest.fixture(scope="module")
def params():
    return gpt.init_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def tpl(tok):
    seq = [tok["[ROI1]"], 40, tok["[BASE]"], tok["[BOI1]"]] + [-1] * 6
    return compile_template(seq, tok, padded_vocab=CFG.vocab_size)


def test_aot_store_roundtrip_bit_identical(tmp_path, tok, params, tpl):
    sp = SamplingParams(seed=11)
    ref_tokens, ref_scores = filling_sequence(params, CFG, tpl, 2, sp)

    store = ProgramStore(str(tmp_path))
    (t1, s1), info1 = filling_sequence_aot(params, CFG, tpl, store, 2, sp)
    assert info1["source"] == "compiled"
    assert len(os.listdir(tmp_path)) == 1  # one .aot entry written

    # a NEW store instance = a restarted process: must LOAD, not compile
    store2 = ProgramStore(str(tmp_path))
    (t2, s2), info2 = filling_sequence_aot(params, CFG, tpl, store2, 2, sp)
    assert info2["source"] == "aot"
    assert info2["key"] == info1["key"]

    np.testing.assert_array_equal(np.asarray(ref_tokens), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(ref_scores), np.asarray(s1))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))


def test_aot_key_separates_statics_and_shapes(tok, params, tpl):
    # batch size is a static of the filling program -> different key
    import jax.numpy as jnp

    dyn = (jnp.zeros((4, 8), jnp.float32),)
    k_a = program_key(dyn, ["b=2"])
    k_b = program_key(dyn, ["b=4"])
    k_c = program_key((jnp.zeros((8, 8), jnp.float32),), ["b=2"])
    assert len({k_a, k_b, k_c}) == 3
    # two DIFFERENT programs with identical signatures must not collide
    k_f = program_key(dyn, ["b=2"], fn_id="other_program")
    assert k_f != k_a


def test_aot_memo_serves_repeat_calls(tmp_path, tok, params, tpl):
    # repeat calls through one store never re-read the pickle: the second
    # call reports source='memory' and works even if the file vanishes
    sp = SamplingParams(seed=7)
    store = ProgramStore(str(tmp_path))
    (t1, _), info1 = filling_sequence_aot(params, CFG, tpl, store, 1, sp)
    os.remove(store._path(info1["key"]))
    (t2, _), info2 = filling_sequence_aot(params, CFG, tpl, store, 1, sp)
    assert info2["source"] == "memory"
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_aot_path_enforces_position_guard(tok, params, tpl):
    # the AOT path shares filling_sequence's up-front guards: an over-long
    # template raises instead of silently sampling NaN garbage
    import dataclasses

    import pytest

    sp = SamplingParams(seed=7)
    store = ProgramStore("/tmp/_unused_aot_store")
    bad = dataclasses.replace(
        tpl, position_ids=tpl.position_ids + 10_000)
    with pytest.raises(ValueError, match="position"):
        filling_sequence_aot(params, CFG, bad, store, 1, sp)


def test_aot_corrupt_entry_recompiles(tmp_path, tok, params, tpl):
    sp = SamplingParams(seed=5)
    store = ProgramStore(str(tmp_path))
    (_, _), info = filling_sequence_aot(params, CFG, tpl, store, 1, sp)
    path = store._path(info["key"])
    with open(path, "wb") as fh:
        fh.write(b"not a pickle")
    assert store.load(info["key"]) is None  # corrupt -> miss
    assert not os.path.exists(path)  # and the bad entry is evicted
    # same-process repeat through the SAME store hits the in-memory memo
    # (never touches disk — that's the point of the memo)
    (_, _), info_memo = filling_sequence_aot(params, CFG, tpl, store, 1, sp)
    assert info_memo["source"] == "memory"
    # a restarted process (fresh store) sees the eviction and recompiles
    store2 = ProgramStore(str(tmp_path))
    (_, _), info2 = filling_sequence_aot(params, CFG, tpl, store2, 1, sp)
    assert info2["source"] == "compiled"  # rebuilt after eviction


def test_aot_version_mismatch_is_miss(tmp_path, tok, params, tpl):
    sp = SamplingParams(seed=5)
    store = ProgramStore(str(tmp_path))
    (_, _), info = filling_sequence_aot(params, CFG, tpl, store, 1, sp)
    path = store._path(info["key"])
    with open(path, "rb") as fh:
        _, nd, payload, in_tree, out_tree = pickle.load(fh)
    with open(path, "wb") as fh:
        pickle.dump((999, nd, payload, in_tree, out_tree), fh)
    assert store.load(info["key"]) is None
