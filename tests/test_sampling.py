"""Sampler semantics: template compilation + the jitted filling loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cogview_tpu.config import tiny_test
from cogview_tpu.generation.sampling import (
    MODE_DEFAULT,
    MODE_IMAGE,
    MODE_TEXT,
    SamplingParams,
    apply_top_k,
    apply_top_p,
    compile_template,
    filling_sequence,
)
from cogview_tpu.models import gpt
from cogview_tpu.tokenization.unified import FakeImageTokenizer, UnifiedTokenizer

MODEL_PATH = "/root/reference/pretrained/chinese_sentencepiece/cog-pretrain.model"


class TinyTextTok:
    """50-token fake text vocab so the tiny GPT's 128-slot vocab fits the
    unified layout: 32 img + 64 txt + 27 commands = 123 <= 128."""

    num_tokens = 64

    def encode(self, s):
        return [ord(c) % 64 for c in s]

    def decode(self, ids):
        return "".join(chr(97 + (i % 26)) for i in ids)


@pytest.fixture(scope="module")
def tok():
    return UnifiedTokenizer(
        img_tokenizer=FakeImageTokenizer(32), txt_tokenizer=TinyTextTok()
    )


CFG = tiny_test()  # vocab 128


@pytest.fixture(scope="module")
def params():
    return gpt.init_params(jax.random.PRNGKey(0), CFG)


def test_compile_template_modes(tok):
    seq = (
        [tok["[ROI1]"]]
        + [40, 50]  # text ids
        + [tok["[BASE]"], tok["[BOI1]"]]
        + [-1] * 8
        + [tok["[EOI1]"]]
        + [-1] * 3
    )
    tpl = compile_template(seq, tok, padded_vocab=CFG.vocab_size)
    assert tpl.context_length == 5
    assert tpl.is_fixed[:5].all() and not tpl.is_fixed[5:13].any()
    # generation slots after [BOI1] are image-mode; after [EOI1] text-mode
    assert (tpl.mask_id[5:13] == MODE_IMAGE).all()
    assert (tpl.mask_id[14:] == MODE_TEXT).all()
    assert tpl.mask_id[0] == MODE_DEFAULT
    # mask table shapes and contents
    assert tpl.mask_table.shape == (3, CFG.vocab_size)
    assert tpl.mask_table[MODE_IMAGE, :32].all()
    assert not tpl.mask_table[MODE_IMAGE, 32:].any()
    assert tpl.mask_table[MODE_TEXT, 32:96].all()
    assert not tpl.mask_table[MODE_TEXT, :32].any()
    assert not tpl.mask_table[MODE_DEFAULT, 123:].any()  # padding masked


def test_roi2_position_restart(tok):
    seq = [tok["[ROI1]"], 40, tok["[ROI2]"], 50, -1, -1]
    tpl = compile_template(seq, tok, padded_vocab=CFG.vocab_size)
    # sampling.py:127 rule: ids > offset shift down by offset (offset=2)
    np.testing.assert_array_equal(tpl.position_ids, [0, 1, 2, 1, 2, 3])


def test_filling_respects_fixed_and_masks(tok, params):
    seq = (
        [tok["[ROI1]"], 40, 50, tok["[BASE]"], tok["[BOI1]"]]
        + [-1] * 8
        + [tok["[EOI1]"]]
    )
    tpl = compile_template(seq, tok, padded_vocab=CFG.vocab_size)
    tokens, scores = filling_sequence(
        params, CFG, tpl, batch_size=2, sampling=SamplingParams(top_k=0, seed=1)
    )
    tokens = np.asarray(tokens)
    assert tokens.shape == (2, len(seq))
    # fixed positions preserved
    np.testing.assert_array_equal(tokens[:, :5], np.asarray([seq[:5]] * 2))
    assert (tokens[:, -1] == tok["[EOI1]"]).all()
    # generated slots are image codes only
    gen = tokens[:, 5:13]
    assert (gen >= 0).all() and (gen < 32).all()
    # scores are negative log-probs sums
    assert (np.asarray(scores) < 0).all()


def test_sampling_is_seed_deterministic(tok, params):
    seq = [tok["[ROI1]"], 40, tok["[BASE]"], tok["[BOI1]"]] + [-1] * 6
    tpl = compile_template(seq, tok, padded_vocab=CFG.vocab_size)
    t1, _ = filling_sequence(params, CFG, tpl, 2, SamplingParams(seed=7))
    t2, _ = filling_sequence(params, CFG, tpl, 2, SamplingParams(seed=7))
    t3, _ = filling_sequence(params, CFG, tpl, 2, SamplingParams(seed=8))
    assert np.array_equal(np.asarray(t1), np.asarray(t2))
    assert not np.array_equal(np.asarray(t1), np.asarray(t3))


def test_batch_samples_differ(tok, params):
    seq = [tok["[ROI1]"], 40, tok["[BASE]"], tok["[BOI1]"]] + [-1] * 8
    tpl = compile_template(seq, tok, padded_vocab=CFG.vocab_size)
    tokens, _ = filling_sequence(params, CFG, tpl, 4, SamplingParams(seed=3))
    tokens = np.asarray(tokens)[:, 4:]
    assert len({tuple(r) for r in tokens}) > 1  # beams genuinely sample


def test_pad_to_bucketing(tok, params):
    seq = [tok["[ROI1]"], 40, tok["[BASE]"], tok["[BOI1]"]] + [-1] * 5
    tpl = compile_template(seq, tok, padded_vocab=CFG.vocab_size, pad_to=16)
    assert tpl.length == 16
    tokens, _ = filling_sequence(params, CFG, tpl, 1, SamplingParams(seed=0))
    tokens = np.asarray(tokens)
    assert (tokens[:, 9:] == tok["[PAD]"]).all()
    assert (tokens[:, 4:9] < 32).all()


def test_top_k_filter():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0, 4.0]])
    out = np.asarray(apply_top_k(logits, 2))
    assert out[0, 1] == 5.0 and out[0, 4] == 4.0
    assert (out[0, [0, 2, 3]] < -1e8).all()


def test_top_p_filter():
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.1, 0.05, 0.05]]))
    out = np.asarray(apply_top_p(logits, 0.7))
    # 0.5 kept; 0.3 crosses the 0.7 threshold and is kept; rest dropped
    assert out[0, 0] > -1e8 and out[0, 1] > -1e8
    assert (out[0, 2:] < -1e8).all()


@pytest.mark.slow
def test_greedy_matches_stepwise_forward(tok, params):
    """temperature->0 (argmax) filling == manual argmax loop over forward."""
    seq = [tok["[ROI1]"], 40, 50, tok["[BASE]"], tok["[BOI1]"]] + [-1] * 4
    tpl = compile_template(seq, tok, padded_vocab=CFG.vocab_size)
    cfg = CFG.replace(pb_relax=False)
    tokens, _ = filling_sequence(
        params, cfg, tpl, 1, SamplingParams(temperature=1e-6, top_k=1, seed=0)
    )
    tokens = np.asarray(tokens)[0]

    # manual loop with the plain (uncached) forward
    cur = list(seq[:5])
    for t in range(5, len(seq)):
        logits = gpt.forward(params, cfg, jnp.asarray([cur], jnp.int32))
        lg = np.array(logits[0, -1])
        lg[~tpl.mask_table[tpl.mask_id[t]]] = -1e9
        cur.append(int(lg.argmax()))
    np.testing.assert_array_equal(tokens, np.asarray(cur))


def test_generated_boi_switches_mode(tok, params):
    """A *sampled* [BOI1] must flip later slots to image-code mode
    (reference sampling.py:119-124) — r1 derived modes only from fixed
    template tokens.  Rig the DEFAULT-mode mask to allow only [BOI1], so
    the first generated slot necessarily samples it; the following slots
    must then be image codes."""
    import dataclasses as dc

    seq = [tok["[ROI1]"], 40, 50] + [-1] * 6
    tpl = compile_template(seq, tok, padded_vocab=CFG.vocab_size)
    table = tpl.mask_table.copy()
    table[0, :] = False
    table[0, tok["[BOI1]"]] = True  # DEFAULT mode can only emit [BOI1]
    tpl = dc.replace(tpl, mask_table=table)

    tokens, _ = filling_sequence(
        params, CFG, tpl, batch_size=2, sampling=SamplingParams(top_k=0, seed=3)
    )
    tokens = np.asarray(tokens)
    assert (tokens[:, 3] == tok["[BOI1]"]).all()  # forced by the rig
    gen = tokens[:, 4:]
    assert (gen >= 0).all() and (gen < 32).all(), gen  # image codes only


def test_generated_eoi_switches_to_text(tok, params):
    """Same rig for [EOI1] -> text-only mode."""
    import dataclasses as dc

    seq = [tok["[BASE]"], tok["[BOI1]"], 3, 4] + [-1] * 5
    tpl = compile_template(seq, tok, padded_vocab=CFG.vocab_size)
    table = tpl.mask_table.copy()
    table[1, :] = False
    table[1, tok["[EOI1]"]] = True  # IMAGE mode can only emit [EOI1]
    tpl = dc.replace(tpl, mask_table=table)

    tokens, _ = filling_sequence(
        params, CFG, tpl, batch_size=2, sampling=SamplingParams(top_k=0, seed=4)
    )
    tokens = np.asarray(tokens)
    assert (tokens[:, 4] == tok["[EOI1]"]).all()
    gen = tokens[:, 5:]
    # text range: [img_vocab, img_vocab + txt_vocab)
    assert (gen >= 32).all() and (gen < 32 + 64).all(), gen


@pytest.mark.slow
def test_fork_marks_share_prefix_then_diverge(tok, params):
    """Fork-to-N (reference add_interlacing_beam_marks + the -N slot
    semantics, sampling.py:168-180, 200-211): before the fork point all
    rows decode one shared sampled prefix; after it they are independent
    samples.  Row 0 must match the unforked run bit-for-bit (it always
    draws at row-coordinate 0)."""
    from cogview_tpu.generation.sampling import add_fork_marks

    seq = [tok["[ROI1]"], 40, tok["[BASE]"], tok["[BOI1]"]] + [-1] * 12
    tpl_plain = compile_template(seq, tok, padded_vocab=CFG.vocab_size)
    assert tpl_plain.fork_n == 0

    # fork at the 7th generation slot (mid-sequence, past the context)
    forked = list(seq)
    forked[4 + 6] = -4
    tpl = compile_template(forked, tok, padded_vocab=CFG.vocab_size)
    assert (tpl.fork_at, tpl.fork_n) == (10, 4)
    assert not tpl.is_fixed[10]  # the marker is still a generation slot

    sp = SamplingParams(seed=11)
    toks, scores = filling_sequence(params, CFG, tpl, batch_size=1, sampling=sp)
    toks = np.asarray(toks)
    assert toks.shape[0] == 4  # batch grew to fork_n
    # shared prefix: all rows identical strictly before fork_at
    assert (toks[:, :10] == toks[:1, :10]).all()
    # divergence after: the 4 continuations are not all identical
    assert any((toks[i, 10:] != toks[0, 10:]).any() for i in range(1, 4))
    # row 0 == unforked batch-4 row 0 (same seed, same coordinates)
    plain, _ = filling_sequence(params, CFG, tpl_plain, batch_size=4, sampling=sp)
    np.testing.assert_array_equal(toks[0], np.asarray(plain)[0])


def test_add_fork_marks_and_validation(tok):
    from cogview_tpu.generation.sampling import add_fork_marks

    seq = [tok["[BOI1]"], -1, -1, -1]
    marked = add_fork_marks(seq, 3)
    assert marked == [tok["[BOI1]"], -3, -1, -1]
    tpl = compile_template(marked, tok, padded_vocab=CFG.vocab_size)
    assert (tpl.fork_at, tpl.fork_n) == (1, 3)
    with pytest.raises(ValueError):
        add_fork_marks([tok["[BOI1]"], 5], 3)  # no generation slots
    with pytest.raises(ValueError):
        compile_template([tok["[BOI1]"], -2, -2], tok,
                         padded_vocab=CFG.vocab_size)  # two markers


def test_cold_start_breakdown_matches_normal_path(tok, params):
    """filling_sequence_cold_start: AOT-phase timings present and the
    tokens identical to the normal call (same program, same rng)."""
    from cogview_tpu.generation.sampling import filling_sequence_cold_start

    seq = [tok["[ROI1]"], 40, tok["[BASE]"], tok["[BOI1]"]] + [-1] * 6
    tpl = compile_template(seq, tok, padded_vocab=CFG.vocab_size)
    sp = SamplingParams(seed=7)
    (tokens, scores), phases = filling_sequence_cold_start(
        params, CFG, tpl, 2, sp)
    want, wscores = filling_sequence(params, CFG, tpl, 2, sp)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(want))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(wscores),
                               rtol=1e-6)
    assert set(phases) == {"trace_s", "backend_compile_s", "first_exec_s"}
    assert all(v >= 0 for v in phases.values())
