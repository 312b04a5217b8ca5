"""Folder-watcher service: done/failed routing and query-file processing."""

import argparse
import os

import numpy as np
import pytest

from cogview_tpu.cli import serve


def test_watch_folder_routes_done_and_failed(tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    (inp / "a.txt").write_text("a query\n")
    (inp / "b.txt").write_text("bad query\n")
    (inp / "notes.md").write_text("ignored: not .txt\n")

    seen = []

    def process(path):
        seen.append(os.path.basename(path))
        if "b.txt" in path:
            raise ValueError("boom")
        return 1

    rc = serve.watch_folder(str(inp), process, time_interval=0, max_polls=1)
    assert rc == 0
    assert sorted(seen) == ["a.txt", "b.txt"]
    # success -> done/; failure -> failed/ with an .err marker; done/ never
    # contains failures (the r1 ADVICE bug: failures were moved to done/)
    assert (inp / "done" / "a.txt").exists()
    assert not (inp / "done" / "b.txt").exists()
    assert (inp / "failed" / "b.txt").exists()
    err = (inp / "failed" / "b.txt.err").read_text()
    assert "ValueError" in err and "boom" in err
    assert (inp / "notes.md").exists()  # non-txt untouched


def test_watch_folder_picks_up_new_files_across_polls(tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    (inp / "first.txt").write_text("q\n")
    calls = []

    def process(path):
        calls.append(os.path.basename(path))
        if len(calls) == 1:  # drop a new file mid-service
            (inp / "second.txt").write_text("q2\n")
        return 1

    serve.watch_folder(str(inp), process, time_interval=0, max_polls=2)
    assert calls == ["first.txt", "second.txt"]
    assert (inp / "done" / "first.txt").exists()
    assert (inp / "done" / "second.txt").exists()


class _FakeResult:
    def __init__(self, texts=(), images=()):
        self.texts = list(texts)
        self.images = list(images)


def test_process_file_writes_outputs(tmp_path, monkeypatch):
    """process_file: one output dir per (file, query-line), captions for
    image2text, PNG grid per sample for text2image; blank lines skipped."""
    qfile = tmp_path / "queries.txt"
    qfile.write_text("a cat\n\n一只狗\n")
    img_dir = tmp_path / "image"
    img_dir.mkdir()

    captured = []

    def fake_generate_once(params, cfg, tokenizer, raw, task, **kw):
        captured.append((raw, task))
        if task == "image2text":
            return _FakeResult(texts=[["一只", "猫"], ["狗"]])
        return _FakeResult(images=[np.zeros((1, 8, 8, 3), np.float32)] * 2)

    monkeypatch.setattr(serve, "generate_once", fake_generate_once)
    args = argparse.Namespace(
        generation_task="image2text", batch_size=2,
        max_inference_batch_size=2, img_folder_path=str(img_dir),
    )
    n = serve.process_file(str(qfile), args, None, None, None, None)
    assert n == 2  # blank line skipped
    assert [r for r, _ in captured] == ["a cat", "一只狗"]
    cap = (img_dir / "queries-0" / "captions.txt").read_text()
    assert "一只 猫" in cap and "狗" in cap
    assert (img_dir / "queries-2" / "captions.txt").exists()

    args.generation_task = "text2image"
    captured.clear()
    n = serve.process_file(str(qfile), args, None, None, None, None)
    assert n == 2
    assert (img_dir / "queries-0" / "0.png").exists()
    assert (img_dir / "queries-0" / "1.png").exists()


def test_main_warmup_runs_before_serving(tmp_path, monkeypatch):
    """--warmup (default): a dummy text2image generation compiles the
    program before the first poll; --no-warmup skips it.  Model loading
    and generation are stubbed — this covers the serve wiring only."""
    calls = []
    monkeypatch.setattr(serve, "load_model", lambda args: ("P", "CFG"))
    monkeypatch.setattr(serve, "build_tokenizer", lambda args: "TOK")
    monkeypatch.setattr(
        serve, "generate_once",
        lambda *a, **k: calls.append(a[3]) or _FakeResult())

    inp, img = tmp_path / "in", tmp_path / "img"
    argv = ["--input-folder-path", str(inp), "--img-folder-path", str(img),
            "--max-polls", "1", "--time-interval", "0"]
    assert serve.main(argv) == 0
    assert len(calls) == 1 and "warmup" in calls[0]

    calls.clear()
    assert serve.main(argv + ["--no-warmup"]) == 0
    assert calls == []
