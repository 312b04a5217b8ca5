"""Preprocessing: sources -> VQ rows -> corpora consumable by the loaders."""

import io
import os
import zipfile

import numpy as np
import pytest

from cogview_tpu.data.datasets import IndexedDataset, get_dataset_by_type
from cogview_tpu.preprocess.raw_datasets import (
    ImageFolderDataset,
    TsvTextSource,
    ZipDataset,
    to_model_input,
)
from cogview_tpu.preprocess.tokenize_images import (
    CompactBinaryWriter,
    make_cut_text_rows,
    make_super_resolution_rows,
    make_text_image_rows,
)
from cogview_tpu.tokenization.unified import FakeImageTokenizer, UnifiedTokenizer

MODEL_PATH = "/root/reference/pretrained/chinese_sentencepiece/cog-pretrain.model"
needs_model = pytest.mark.skipif(
    not os.path.exists(MODEL_PATH), reason="cog-pretrain.model not available"
)


class StubVQ:
    num_tokens = 8192

    def EncodeAsIds(self, imgs):
        imgs = np.asarray(imgs)
        n, s = imgs.shape[0], imgs.shape[1] // 8
        rng = np.random.RandomState(int(imgs.sum()) % 1000 + s)
        return rng.randint(0, 8192, size=(n, s * s))


@pytest.fixture(scope="module")
def tok():
    return UnifiedTokenizer(img_tokenizer=StubVQ(), text_model_path=MODEL_PATH)


def _make_zip(path, n=6):
    from PIL import Image

    rng = np.random.RandomState(0)
    with zipfile.ZipFile(path, "w") as z:
        for i in range(n):
            arr = (rng.rand(280, 300, 3) * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, "PNG")
            z.writestr(f"img_{i}.png", buf.getvalue())


def test_to_model_input_shape():
    from PIL import Image

    img = Image.new("RGB", (640, 480), (128, 64, 32))
    arr = to_model_input(img, 256)
    assert arr.shape == (256, 256, 3)
    assert np.isfinite(arr).all()


def test_zip_source_and_tsv(tmp_path):
    zp = str(tmp_path / "imgs.zip")
    _make_zip(zp)
    names = [name for name, arr in ZipDataset(zp, 64)]
    assert len(names) == 6
    tsv = tmp_path / "cap.tsv"
    tsv.write_text("img_0.png\thello\nimg_1.png\tworld\n")
    src = TsvTextSource(str(tsv))
    assert src.lookup("img_0.png") == "hello"
    assert src.lookup("img_0") == "hello"  # stem fallback
    assert src.lookup("missing.png") is None


@needs_model
def test_text_image_rows_roundtrip(tok, tmp_path):
    zp = str(tmp_path / "imgs.zip")
    _make_zip(zp)
    tsv = tmp_path / "cap.tsv"
    tsv.write_text("".join(f"img_{i}.png\t第{i}张图\n" for i in range(6)))
    out = str(tmp_path / "c_t2i.bin")
    writer = CompactBinaryWriter(out)
    n = make_text_image_rows(
        StubVQ(), tok, iter(ZipDataset(zp, 256)), TsvTextSource(str(tsv)),
        writer, batch_size=4,
    )
    writer.close()
    assert n == 6
    ds = get_dataset_by_type("CompactBinaryDataset", out, tok, max_len=1089)
    s = ds[0]
    sep = int(s["loss_mask"].sum())
    assert s["text"][0] == tok["[ROI1]"]
    assert s["text"][sep - 1] == tok["[EOI1]"]


@needs_model
def test_super_resolution_rows(tok):
    samples = ((f"i{i}", np.zeros((512, 512, 3), np.float32)) for i in range(2))

    class T:
        def lookup(self, name):
            return "测试"

    rows = []
    n = make_super_resolution_rows(StubVQ(), tok, samples, T(), rows,
                                   sampling_num=3, batch_size=2)
    assert n == 6
    r = rows[0]
    assert r[0] == tok["[ROI1]"] and r[-1] == tok["[EOI2]"]
    # both code blocks are 32x32
    boi1 = int(np.nonzero(r == tok["[BOI1]"])[0][0])
    eoi1 = int(np.nonzero(r == tok["[EOI1]"])[0][0])
    assert eoi1 - boi1 - 1 == 1024


@needs_model
def test_cut_text_rows(tok, tmp_path):
    rows = []
    n = make_cut_text_rows(tok, ["你好世界", "第二句话", "第三句更长一些"] * 20, 64, rows)
    assert n >= 1
    assert all(len(r) == 64 for r in rows)
    base = str(tmp_path / "txt")
    IndexedDataset.write(base, rows)
    ds = get_dataset_by_type("TokenizedDataset", base, tok, max_len=64)
    s = ds[0]
    assert s["text"].shape == (64,)
    assert s["loss_mask"].sum() == 64


def _png_bytes(seed: int, size=(20, 16)) -> bytes:
    from PIL import Image

    rng = np.random.RandomState(seed)
    buf = io.BytesIO()
    Image.fromarray(rng.randint(0, 255, (*size, 3), np.uint8)).save(
        buf, format="PNG")
    return buf.getvalue()


@pytest.fixture
def rar_path(tmp_path):
    from cogview_tpu.preprocess.rar_reader import write_stored_rar4

    files = {f"sub/img_{i}.png": _png_bytes(i) for i in range(4)}
    files["caption.txt"] = b"not an image"
    return write_stored_rar4(str(tmp_path / "imgs.rar"), files), files


def test_rar_roundtrip_bytes(rar_path):
    """write_stored_rar4 -> libarchive decode: names + bytes exact (the
    decoder checks both header CRC16 and per-file CRC32, so this pins the
    writer to the real RAR4 format, not to our own parser)."""
    from cogview_tpu.preprocess.rar_reader import has_rar_support, iter_rar_entries

    if not has_rar_support():
        pytest.skip("system libarchive not available")
    path, files = rar_path
    assert dict(iter_rar_entries(path)) == files


def test_rar_streaming_nonseekable(rar_path):
    """StreamingRarDataset analog: a non-seekable stream decodes the same
    entries (libarchive consumes it via read callbacks, single pass)."""
    from cogview_tpu.preprocess.rar_reader import has_rar_support, iter_rar_entries

    if not has_rar_support():
        pytest.skip("system libarchive not available")
    path, files = rar_path

    class NonSeekable(io.RawIOBase):
        def __init__(self, b):
            self.b = io.BytesIO(b)

        def read(self, n=-1):
            return self.b.read(n)

        def seekable(self):
            return False

    with open(path, "rb") as f:
        data = f.read()
    assert dict(iter_rar_entries(NonSeekable(data))) == files


def test_rar_corruption_detected(rar_path):
    from cogview_tpu.preprocess.rar_reader import has_rar_support, iter_rar_entries

    if not has_rar_support():
        pytest.skip("system libarchive not available")
    path, _ = rar_path
    bad = bytearray(open(path, "rb").read())
    bad[-40] ^= 0xFF
    with pytest.raises(RuntimeError):
        dict(iter_rar_entries(io.BytesIO(bytes(bad))))


def test_rar_image_source(rar_path):
    """open_image_source('.rar') yields decoded images, skipping the
    non-image member (reference RarDataset, raw_datasets.py:38-60)."""
    from cogview_tpu.preprocess.rar_reader import has_rar_support
    from cogview_tpu.preprocess.raw_datasets import open_image_source

    if not has_rar_support():
        pytest.skip("system libarchive not available")
    path, _ = rar_path
    items = list(open_image_source(path, img_size=16))
    assert sorted(n for n, _ in items) == [f"sub/img_{i}.png" for i in range(4)]
    for _, arr in items:
        assert arr.shape == (16, 16, 3) and np.isfinite(arr).all()
