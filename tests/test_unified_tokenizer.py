"""Unified tokenizer: vocab layout, command tokens, parse_query semantics."""

import os

import numpy as np
import pytest

from cogview_tpu.tokenization.unified import (
    RAW_COMMAND_TOKENS,
    FakeImageTokenizer,
    UnifiedTokenizer,
)

MODEL_PATH = "/root/reference/pretrained/chinese_sentencepiece/cog-pretrain.model"

needs_model = pytest.mark.skipif(
    not os.path.exists(MODEL_PATH), reason="cog-pretrain.model not available"
)


class RecordingImageTokenizer(FakeImageTokenizer):
    """Fake VQ tokenizer that fabricates deterministic codes per path."""

    def read_img(self, path, img_size=256):
        return path

    def EncodeAsIds(self, img):
        rng = np.random.RandomState(abs(hash(img)) % (2**31))
        return rng.randint(0, self.num_tokens, size=(1, 1024))

    def DecodeIds(self, ids):
        return np.asarray(ids)


@pytest.fixture(scope="module")
def tok():
    return UnifiedTokenizer(
        img_tokenizer=RecordingImageTokenizer(8192), text_model_path=MODEL_PATH
    )


@needs_model
def test_vocab_layout(tok):
    # 8192 + 50000 + 27 = 58219 (SURVEY.md §2.4)
    assert len(tok) == 58219
    assert tok["[PAD]"] == 58192
    assert tok["[BOI1]"] == 58193
    assert tok["[EOI1]"] == 58196
    assert tok["[ROI1]"] == 58199
    assert tok["[ROI2]"] == 58200
    assert tok["[BASE]"] == 58208
    assert tok["[POS0]"] == 58210  # documented in reference comments
    assert tok["[POS8]"] == 58218
    assert len(RAW_COMMAND_TOKENS) == 27


@needs_model
def test_encode_text_offset(tok):
    ids = tok.EncodeAsIds("一只猫")
    assert all(8192 <= t < 58192 for t in ids)


@needs_model
def test_parse_query_text2image(tok):
    q = "[ROI1] 一只可爱的小猫 [BASE] [BOI1] [MASK]*1024"
    seq = tok.parse_query(q)
    assert seq[0] == tok["[ROI1]"]
    assert seq[-1024:] == [-1] * 1024
    boi_pos = seq.index(tok["[BOI1]"])
    assert seq[boi_pos - 1] == tok["[BASE]"]
    # text ids sit between ROI1 and BASE
    assert all(8192 <= t < 58192 for t in seq[1 : boi_pos - 1])
    assert len(seq) == boi_pos + 1 + 1024


@needs_model
def test_parse_query_image_ref(tok):
    q = "[BASE] [BOI1] [Image]somepath.png [EOI1] [ROI1] [MASK]*20"
    seq = tok.parse_query(q)
    assert seq[0] == tok["[BASE]"]
    assert seq[1] == tok["[BOI1]"]
    img_part = seq[2:1026]
    assert all(0 <= t < 8192 for t in img_part)
    assert seq[1026] == tok["[EOI1]"]
    assert seq[-20:] == [-1] * 20

    # truncated image: [Image*512] keeps first 512 codes, rest -1
    seq2 = tok.parse_query("[BOI2] [Image*512]somepath.png [EOI2]")
    img2 = seq2[1:1025]
    assert all(0 <= t < 8192 for t in img2[:512])
    assert img2[512:] == [-1] * 512


@needs_model
def test_wrap_code(tok):
    code = list(range(1024))
    wrapped = tok.wrap_code(code, idx=1)
    assert wrapped[0] == tok["[BASE]"]
    assert wrapped[1] == tok["[BOI1]"]
    assert wrapped[-1] == tok["[EOI1]"]
    assert wrapped[2:-1] == code

    wrapped2 = tok.wrap_code(list(range(4096)), idx=2)
    assert wrapped2[0] == tok["[BIG]"]
    assert wrapped2[1] == tok["[BOI2]"]
    assert wrapped2[-1] == tok["[EOI2]"]


@needs_model
def test_decode_ids_stream_split(tok):
    text_ids = tok.EncodeAsIds("一只猫")
    seq = (
        [tok["[ROI1]"]]
        + text_ids
        + [tok["[BASE]"], tok["[BOI1]"]]
        + list(range(16))
        + [tok["[EOI1]"]]
    )
    parts, images = tok.DecodeIds(seq)
    assert parts[0] == "[ROI1]"
    assert "猫" in parts[1]
    assert len(images) == 1
    assert list(images[0]) == list(range(16))
