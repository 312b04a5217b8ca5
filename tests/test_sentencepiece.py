"""Tests for the from-scratch SentencePiece BPE runtime.

Ground truth is the cog-pretrain.model file itself: piece ids are the proto
order (cross-checked against cog-pretrain.vocab), merges replay recorded
ranks, and normalization must agree with unicodedata NFKC on
representative codepoints.
"""

import os
import unicodedata

import pytest

from cogview_tpu.tokenization.spm_proto import (
    MODEL_BPE,
    PIECE_CONTROL,
    PIECE_UNKNOWN,
    PIECE_USER_DEFINED,
    load_model,
)
from cogview_tpu.tokenization.text_tokenizer import from_pretrained

MODEL_PATH = "/root/reference/pretrained/chinese_sentencepiece/cog-pretrain.model"
VOCAB_PATH = "/root/reference/pretrained/chinese_sentencepiece/cog-pretrain.vocab"

needs_model = pytest.mark.skipif(
    not os.path.exists(MODEL_PATH), reason="cog-pretrain.model not available"
)


@pytest.fixture(scope="module")
def tok():
    return from_pretrained(MODEL_PATH)


@needs_model
def test_model_structure(tok):
    m = tok.model
    assert m.model_type == MODEL_BPE
    assert m.vocab_size == 50000
    assert m.pieces[0] == "<unk>" and m.types[0] == PIECE_UNKNOWN
    assert m.pieces[1] == "<s>" and m.types[1] == PIECE_CONTROL
    assert m.pieces[2] == "</s>" and m.types[2] == PIECE_CONTROL
    assert m.types[3] == PIECE_USER_DEFINED  # <n>
    assert m.normalizer.name == "nmt_nfkc"
    assert len(m.normalizer.precompiled_charsmap) > 100000


@needs_model
def test_vocab_file_agreement(tok):
    """Ids assigned by proto order must match the .vocab line order."""
    with open(VOCAB_PATH, encoding="utf-8") as f:
        for i, line in enumerate(f):
            piece = line.rstrip("\n").split("\t")[0]
            assert tok.model.pieces[i] == piece, f"id {i}"
    assert i == 49999


@needs_model
def test_charsmap_matches_nfkc(tok):
    """nmt_nfkc ≈ NFKC for ordinary text; check a broad sample."""
    norm = tok.bpe.normalizer
    samples = [
        "Ａｂｃ１２３",  # fullwidth
        "①②③",
        "ﬁnancial",  # ligature
        "ＫＧＢ",
        "Ⅷ",
        "㎞㎡",
        "中文没有变化",
        "한국어",
    ]
    for s in samples:
        got = norm.charsmap_normalize(s)
        want = unicodedata.normalize("NFKC", s)
        assert got == want, f"{s!r}: {got!r} != {want!r}"


@needs_model
def test_nmt_whitespace_rules(tok):
    norm = tok.bpe.normalizer
    assert norm.normalize("hello world") == "▁hello▁world"
    assert norm.normalize("  hello   world  ") == "▁hello▁world"
    assert norm.normalize("a\tb") == "▁a▁b"  # nmt rules: tab -> space


@needs_model
def test_encode_decode_roundtrip(tok):
    """decode(encode(s)) equals the *normalized* input — NFKC is lossy by
    design (e.g. fullwidth '，' -> ','), exactly as the C++ runtime behaves."""
    samples = [
        "一只可爱的小猫",
        "北京的秋天",
        "a photo of a cat",
        "深度学习模型在TPU上训练",
        "山水画 风景 中国风",
        "这是一个测试句子，包含标点符号。",
    ]
    norm = tok.bpe.normalizer
    for s in samples:
        ids = tok.encode(s)
        assert all(0 <= t < 50000 for t in ids)
        expected = " ".join(p for p in norm.charsmap_normalize(s).split(" ") if p)
        assert tok.decode(ids) == expected, s


@needs_model
def test_known_piece_ids(tok):
    """Spot-check ids against the vocab file order."""
    assert tok.convert_token_to_id("<unk>") == 0
    assert tok.convert_token_to_id("<n>") == 3
    # id 4 is the first learned piece
    assert tok.convert_token_to_id(tok.model.pieces[4]) == 4


@needs_model
def test_single_char_segmentation(tok):
    """Every common Chinese char should map to a non-unk id."""
    for ch in "的一是在不了有和人这":
        ids = tok.encode(ch)
        assert 0 not in ids, ch


@needs_model
def test_merge_determinism(tok):
    s = "清晨的阳光洒在湖面上"
    assert tok.encode(s) == tok.encode(s)
    pieces = tok.tokenize(s)
    assert "".join(pieces).replace("▁", " ").strip() == s
