"""TSV eval corpus streaming (reference eval_utils/dataset.py:9-33),
streaming FID statistics, and the VQ recover-grid debug tool
(reference preprocess/utils.py:23-31)."""

import base64
import io

import numpy as np
import pytest

from cogview_tpu.eval_utils.dataset import (
    TsvImageStream,
    encode_image_base64,
    iter_tsv_image_batches,
)
from cogview_tpu.eval_utils.fid import (
    StreamingStats,
    compute_statistics,
    statistics_from_batches,
)


def _write_tsv(path, imgs, captions=None):
    rows = []
    for i, img in enumerate(imgs):
        cap = (captions or {}).get(i, f"caption {i}")
        rows.append(f"id{i}\t_\t{cap}\t{encode_image_base64(img)}")
    path.write_text("\n".join(rows) + "\n", encoding="utf-8")


def test_streaming_stats_matches_np_cov():
    rng = np.random.RandomState(0)
    feats = rng.randn(47, 8)
    mu_ref, sigma_ref = compute_statistics(feats)
    stats = StreamingStats()
    for i in range(0, len(feats), 5):  # ragged batches
        stats.update(feats[i:i + 5])
    mu, sigma = stats.finalize()
    assert stats.n == 47
    np.testing.assert_allclose(mu, mu_ref, atol=1e-12)
    np.testing.assert_allclose(sigma, sigma_ref, atol=1e-10)


def test_streaming_stats_rejects_degenerate():
    stats = StreamingStats()
    with pytest.raises(ValueError):
        stats.update(np.zeros(4))  # not [n, d]
    stats.update(np.zeros((1, 4)))
    with pytest.raises(ValueError):
        stats.finalize()  # n < 2


def test_tsv_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    imgs = rng.rand(5, 16, 16, 3).astype(np.float32)
    p = tmp_path / "corpus.tsv"
    _write_tsv(p, imgs, captions={2: "a bird"})
    stream = TsvImageStream(str(p), img_size=16)
    got = list(stream)
    assert stream.yielded == 5 and stream.skipped == 0
    assert [i for _, i, _ in got] == [f"id{k}" for k in range(5)]
    assert got[2][2] == "a bird"
    for (img, _i, _c), want in zip(got, imgs):
        # PNG encode is lossless up to the uint8 quantization
        np.testing.assert_allclose(img, np.round(want * 255) / 255, atol=1 / 255)


def test_tsv_skips_bad_rows_and_resizes(tmp_path):
    rng = np.random.RandomState(2)
    good = rng.rand(32, 32, 3).astype(np.float32)
    p = tmp_path / "c.tsv"
    lines = [
        f"id0\t_\tcap\t{encode_image_base64(good)}",
        "id1\t_\tcap\tnot-base64!!!",  # undecodable -> skipped
        "short\trow",                  # too few columns -> skipped
        f"id3\t_\tcap\t{encode_image_base64(good)}",
    ]
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    stream = TsvImageStream(str(p), img_size=16)  # forces resize 32->16
    got = list(stream)
    assert [i for _, i, _ in got] == ["id0", "id3"]
    assert stream.skipped == 2
    assert got[0][0].shape == (16, 16, 3)


def test_tsv_caption_only_and_limit(tmp_path):
    p = tmp_path / "caps.tsv"
    p.write_text("a\tfirst\nb\tsecond\nbad\nc\tthird\n", encoding="utf-8")
    stream = TsvImageStream(str(p), img_size=8, caption_only=True)
    got = list(stream)
    assert [(i, c) for _, i, c in got] == [
        ("a", "first"), ("b", "second"), ("c", "third")]
    assert got[0][0].shape == (8, 8, 3) and not got[0][0].any()
    assert stream.skipped == 1
    limited = list(TsvImageStream(str(p), img_size=8, caption_only=True, limit=2))
    assert len(limited) == 2


def test_tsv_batches_and_streamed_fid_match_in_memory(tmp_path):
    rng = np.random.RandomState(3)
    imgs = rng.rand(7, 8, 8, 3).astype(np.float32)
    p = tmp_path / "c.tsv"
    _write_tsv(p, imgs)

    batches = list(iter_tsv_image_batches(str(p), batch_size=3, img_size=8))
    assert [len(b) for b in batches] == [3, 3, 1]

    def extractor(batch):  # cheap stand-in: per-channel spatial means
        return np.asarray(batch).reshape(len(batch), -1, 3).mean(axis=1)

    mu_s, sig_s = statistics_from_batches(
        iter_tsv_image_batches(str(p), batch_size=3, img_size=8), extractor)
    all_imgs = np.concatenate(batches)
    mu_m, sig_m = compute_statistics(extractor(all_imgs))
    np.testing.assert_allclose(mu_s, mu_m, atol=1e-12)
    np.testing.assert_allclose(sig_s, sig_m, atol=1e-12)


def test_cli_source_statistics_tsv_equals_dir(tmp_path):
    from PIL import Image

    from cogview_tpu.cli.fid import source_statistics

    rng = np.random.RandomState(4)
    imgs = (rng.rand(4, 16, 16, 3) * 255).astype(np.uint8)
    d = tmp_path / "imgs"
    d.mkdir()
    for i, a in enumerate(imgs):
        Image.fromarray(a).save(d / f"{i:03d}.png")
    t = tmp_path / "imgs.tsv"
    _write_tsv(t, imgs.astype(np.float32) / 255.0)

    def extractor(batch):
        return np.asarray(batch).reshape(len(batch), -1, 3).mean(axis=1)

    mu_d, sig_d, n_d = source_statistics(str(d), extractor, 2, img_size=16)
    mu_t, sig_t, n_t = source_statistics(str(t), extractor, 2, img_size=16)
    assert n_d == n_t == 4
    np.testing.assert_allclose(mu_d, mu_t, atol=1e-12)
    np.testing.assert_allclose(sig_d, sig_t, atol=1e-12)


def test_recover_grid(tmp_path):
    from cogview_tpu.preprocess.recover_grid import write_recover_grid
    from cogview_tpu.tokenization.vq_tokenizer import JaxVQTokenizer

    vq = JaxVQTokenizer.random_init()
    rng = np.random.RandomState(5)
    imgs = rng.randn(3, 16, 16, 3).astype(np.float32)  # normalized inputs
    out = tmp_path / "grid.png"
    grid = write_recover_grid(vq, imgs, str(out))
    assert grid.shape == (32, 48, 3)
    assert out.exists()
    from PIL import Image

    assert Image.open(out).size == (48, 32)  # (w, h)
