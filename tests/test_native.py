"""Native (C++) components vs their Python twins: byte-identical outputs."""

import os
import subprocess

import numpy as np
import pytest

MODEL_PATH = "/root/reference/pretrained/chinese_sentencepiece/cog-pretrain.model"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

needs_model = pytest.mark.skipif(
    not os.path.exists(MODEL_PATH), reason="cog-pretrain.model not available"
)


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", os.path.join(REPO, "csrc")], check=True,
                   capture_output=True)


@pytest.fixture(scope="module")
def cpp_tok():
    from cogview_tpu.tokenization.sp_cpp import CppTextTokenizer, available

    if not available():
        pytest.skip("libspm.so not built")
    return CppTextTokenizer(MODEL_PATH)


@pytest.fixture(scope="module")
def py_tok():
    from cogview_tpu.tokenization.text_tokenizer import from_pretrained

    return from_pretrained(MODEL_PATH)


CORPUS = [
    "一只可爱的小猫",
    "北京的秋天，金色的落叶。",
    "a photo of a cat sitting on a windowsill",
    "深度学习模型在TPU上训练效率更高",
    "山水画 风景 中国风 水墨",
    "ＫＧＢ①ﬁ",  # NFKC-heavy
    "   leading and   multiple   spaces   ",
    "混合 mixed 语言 text ０１２",
    "",
    "電腦科學與技術",
]


@needs_model
def test_cpp_ids_match_python(cpp_tok, py_tok):
    assert cpp_tok.num_tokens == py_tok.num_tokens == 50000
    for s in CORPUS:
        assert cpp_tok.encode(s) == py_tok.encode(s), repr(s)


@needs_model
def test_cpp_decode_matches_python(cpp_tok, py_tok):
    for s in CORPUS:
        ids = py_tok.encode(s)
        assert cpp_tok.decode(ids) == py_tok.decode(ids), repr(s)


@needs_model
def test_cpp_piece_lookup(cpp_tok, py_tok):
    for piece in ["<unk>", "<n>", py_tok.model.pieces[4], py_tok.model.pieces[100]]:
        assert cpp_tok.convert_token_to_id(piece) == py_tok.convert_token_to_id(piece)


@needs_model
def test_cpp_throughput_sanity(cpp_tok, py_tok):
    """The native encoder must beat Python by a wide margin on bulk text."""
    import time

    text = "深度学习模型在TPU上训练效率更高，因为矩阵乘法单元。" * 50
    t0 = time.time()
    for _ in range(20):
        cpp_ids = cpp_tok.encode(text)
    cpp_dt = time.time() - t0
    t0 = time.time()
    for _ in range(20):
        py_ids = py_tok.encode(text)
    py_dt = time.time() - t0
    assert cpp_ids == py_ids
    assert cpp_dt < py_dt, f"C++ {cpp_dt:.3f}s not faster than Python {py_dt:.3f}s"


@needs_model
def test_native_dataio_matches_python(tmp_path):
    from cogview_tpu.data.datasets import get_dataset_by_type
    from cogview_tpu.data.native_loader import NativeCompactDataset, available
    from cogview_tpu.tokenization.unified import FakeImageTokenizer, UnifiedTokenizer

    if not available():
        pytest.skip("libdataio.so not built")

    tok = UnifiedTokenizer(img_tokenizer=FakeImageTokenizer(8192),
                           text_model_path=MODEL_PATH)
    rng = np.random.RandomState(0)
    n = 16
    rows = np.full((n, 64 + 1024), -1, np.int32)
    rows[:, :12] = rng.randint(8192, 58192, size=(n, 12))
    rows[:, 64:] = rng.randint(0, 8192, size=(n, 1024))
    path = str(tmp_path / "c.bin")
    rows.tofile(path)

    py_ds = get_dataset_by_type("CompactBinaryDataset", path, tok, max_len=1089)
    native = NativeCompactDataset(path, tok, max_len=1089)
    assert len(native) == len(py_ds) == n

    idx = np.asarray([0, 3, 7, 15], np.int64)
    nb = native.batch(idx)
    for j, i in enumerate(idx):
        ps = py_ds[int(i)]
        np.testing.assert_array_equal(nb["text"][j], ps["text"])
        np.testing.assert_array_equal(nb["loss_mask"][j], ps["loss_mask"])
