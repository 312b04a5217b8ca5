"""Pure-Python LMDB reader/writer round-trips + the import-lmdb CLI.

The writer follows the documented lmdb.h/mdb.c struct layout; round-trip
tests cover leaf-only trees, multi-level branch trees, overflow (bigdata)
values, the reference corpus convention (pickled rows + 'length'), and
format-level invariants (meta magic, psize slot, overflow page headers).
"""

import pickle
import struct

import numpy as np
import pytest

from cogview_tpu.data.lmdb_io import (
    LMDBCorpusReader,
    LMDBReader,
    MDB_MAGIC,
    write_lmdb,
    write_reference_corpus,
)


def test_small_roundtrip(tmp_path):
    items = [(f"k{i:03d}".encode(), f"value-{i}".encode()) for i in range(50)]
    path = write_lmdb(str(tmp_path / "env"), items)
    with LMDBReader(path) as db:
        assert len(db) == 50
        assert db.depth == 1  # fits one leaf
        for k, v in items:
            assert db.get(k) == v
        assert db.get(b"missing") is None
        assert list(db.items()) == sorted(items)


def test_multilevel_btree(tmp_path):
    """Enough entries to force branch pages (depth >= 2) and key order
    that differs from insertion order."""
    rng = np.random.RandomState(0)
    items = [
        (b"key-%08d" % int(i), rng.bytes(40))
        for i in rng.permutation(5000)
    ]
    path = write_lmdb(str(tmp_path / "env"), items)
    with LMDBReader(path) as db:
        assert db.depth >= 2 and db.branch_pages >= 1
        assert len(db) == 5000
        for k, v in items[::97]:
            assert db.get(k) == v
        got = list(db.items())
        assert got == sorted(items)


def test_overflow_values(tmp_path):
    """Values larger than a page must use overflow (bigdata) chains —
    the pickled 1088-token rows of real corpora are ~4.4KB."""
    rng = np.random.RandomState(1)
    items = [(b"big-%d" % i, rng.bytes(3000 + 4096 * i)) for i in range(4)]
    items += [(b"small-%d" % i, b"x" * 10) for i in range(3)]
    path = write_lmdb(str(tmp_path / "env"), items)
    with LMDBReader(path) as db:
        assert db.overflow_pages > 0
        for k, v in items:
            assert db.get(k) == v


def test_meta_format_invariants(tmp_path):
    path = write_lmdb(str(tmp_path / "env"), [(b"a", b"1")])
    raw = open(path, "rb").read()
    psize = 4096
    # both meta pages carry the magic; live meta (txnid 1) is page 1
    for pg in (0, 1):
        magic, version = struct.unpack_from("<II", raw, pg * psize + 16)
        assert magic == MDB_MAGIC and version == 1
        # free-db pad slot holds the page size
        assert struct.unpack_from("<I", raw, pg * psize + 16 + 24)[0] == psize
    txn0 = struct.unpack_from("<Q", raw, 16 + 128)[0]
    txn1 = struct.unpack_from("<Q", raw, psize + 16 + 128)[0]
    assert (txn0, txn1) == (0, 1)


def test_reference_corpus_convention(tmp_path):
    """Rows exactly as the reference writers produce them: pickled numpy
    arrays under str(i) keys + a 'length' count (datasets.py:34-61)."""
    rng = np.random.RandomState(2)
    rows = [rng.randint(0, 58219, size=1088).astype(np.int64) for _ in range(12)]
    env = str(tmp_path / "corpus")
    write_reference_corpus(env, rows)
    reader = LMDBCorpusReader(env)  # env directory, like lmdb.open(path)
    assert len(reader) == 12
    for i, row in enumerate(rows):
        np.testing.assert_array_equal(reader[i], row)
    with pytest.raises(IndexError):
        reader[12]
    reader.close()


def test_tuple_rows_roundtrip(tmp_path):
    """(text, code) pickled pairs — the TextCodeDataset LMDB layout."""
    rows = [
        (np.arange(5, dtype=np.int64), np.arange(16, dtype=np.int64) + 100)
        for _ in range(3)
    ]
    env = str(tmp_path / "pairs")
    write_reference_corpus(env, rows)
    r = LMDBCorpusReader(env)
    text, code = r[1]
    np.testing.assert_array_equal(text, rows[1][0])
    np.testing.assert_array_equal(code, rows[1][1])
    r.close()


def test_import_lmdb_cli(tmp_path):
    """import-lmdb -> IndexedDataset readable as TokenizedDataset."""
    from cogview_tpu.cli import preprocess
    from cogview_tpu.data.datasets import IndexedDataset

    rng = np.random.RandomState(3)
    rows = [rng.randint(0, 1000, size=30 + i).astype(np.int64) for i in range(8)]
    env = str(tmp_path / "corpus")
    write_reference_corpus(env, rows)
    out = str(tmp_path / "imported")
    rc = preprocess.main(["--task", "import-lmdb", "--lmdb-path", env,
                          "--output", out])
    assert rc == 0
    ds = IndexedDataset(out)
    assert len(ds) == 8
    for i, row in enumerate(rows):
        np.testing.assert_array_equal(np.asarray(ds[i]), row)


def test_import_lmdb_cli_tuple_rows(tmp_path):
    from cogview_tpu.cli import preprocess
    from cogview_tpu.data.datasets import IndexedDataset

    rows = [
        (np.arange(4, dtype=np.int64) + 7, np.arange(8, dtype=np.int64) + 50)
        for _ in range(3)
    ]
    env = str(tmp_path / "pairs")
    write_reference_corpus(env, rows)
    out = str(tmp_path / "imported_pairs")
    assert preprocess.main(["--task", "import-lmdb", "--lmdb-path", env,
                            "--output", out]) == 0
    ds = IndexedDataset(out)
    row = np.asarray(ds[0])
    # TextCodeDataset layout: text ++ [-1] ++ code
    np.testing.assert_array_equal(row[:4], rows[0][0])
    assert row[4] == -1
    np.testing.assert_array_equal(row[5:], rows[0][1])
