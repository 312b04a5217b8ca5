"""Preprocessing CLI — the reference ``preprocess_entry.py`` rebuilt.

Streams images from a folder/zip/tar/rar/h5 source, looks up captions in a
TSV/JSON text source, VQ-encodes on the accelerator, and writes training
corpora: CompactBinary .bin for text2image, IndexedDataset for
super-resolution pairs and pure text.

  python -m cogview_tpu.cli.preprocess --task text2image \
      --image-source imgs.zip --text-source captions.tsv \
      --img-tokenizer-path vqvae.pt --output data/mycorpus_t2i.bin

``--task import-lmdb`` converts an existing reference LMDB corpus
(pickled rows + 'length' key, preprocess_text_image_data.py:29-64) into
an IndexedDataset usable as --dataset-type TokenizedDataset — no lmdb
library needed (pure-Python reader, data/lmdb_io.py):

  python -m cogview_tpu.cli.preprocess --task import-lmdb \
      --lmdb-path /path/to/lmdb_env --output data/imported
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser():
    p = argparse.ArgumentParser("cogview-tpu preprocess")
    p.add_argument("--task", default="text2image",
                   choices=["text2image", "super-resolution", "text",
                            "import-lmdb"])
    p.add_argument("--lmdb-path", default=None,
                   help="LMDB environment dir (or data.mdb) for import-lmdb")
    p.add_argument("--image-source", default=None,
                   help="dir | .zip | .tar[.gz] | .rar | .h5 of images")
    p.add_argument("--text-source", default=None, help=".tsv or .json captions")
    p.add_argument("--output", required=True)
    p.add_argument("--img-tokenizer-path", default=None)
    p.add_argument("--text-model-path", default=None)
    p.add_argument("--img-size", type=int, default=None,
                   help="default: 256 (t2i) / 512 (super-resolution)")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--sampling-num", type=int, default=4,
                   help="SR patches sampled per image")
    p.add_argument("--seq-len", type=int, default=1089, help="text task row length")
    p.add_argument("--recover-grid", default=None, metavar="PNG",
                   help="debug: before writing the corpus, VQ-roundtrip the "
                        "first --batch-size images and save an "
                        "original-vs-recovered grid (reference "
                        "show_recover_results, preprocess/utils.py:23-31)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from ..data.datasets import IndexedDataset
    from ..preprocess.raw_datasets import TsvTextSource, open_image_source
    from ..preprocess.tokenize_images import (
        CompactBinaryWriter,
        make_cut_text_rows,
        make_super_resolution_rows,
        make_text_image_rows,
    )
    from ..tokenization import UnifiedTokenizer
    from ..tokenization.vq_tokenizer import JaxVQTokenizer

    t0 = time.time()
    if args.task == "import-lmdb":
        import numpy as np

        from ..data.lmdb_io import LMDBCorpusReader

        src = LMDBCorpusReader(args.lmdb_path or args.image_source)

        def rows():
            for i in range(len(src)):
                row = src[i]
                if isinstance(row, (tuple, list)) and len(row) == 2:
                    # (text, code) pairs -> our TextCodeDataset layout
                    text, code = (np.asarray(r).ravel() for r in row)
                    yield np.concatenate([text, [-1], code])
                else:
                    yield np.asarray(row).ravel()

        IndexedDataset.write(args.output, rows())
        print(f"imported {len(src)} LMDB rows -> {args.output}.bin "
              f"in {time.time()-t0:.1f}s")
        src.close()
        return 0

    if args.task == "text":
        tok = UnifiedTokenizer(text_model_path=args.text_model_path)
        with open(args.text_source or args.image_source, encoding="utf-8") as f:
            texts = [line.strip() for line in f if line.strip()]
        rows = []
        n = make_cut_text_rows(tok, texts, args.seq_len, rows)
        IndexedDataset.write(args.output, rows)
        print(f"wrote {n} rows -> {args.output}.bin in {time.time()-t0:.1f}s")
        return 0

    if args.img_tokenizer_path:
        vq = JaxVQTokenizer.from_checkpoint(args.img_tokenizer_path)
    else:
        print("[warn] no --img-tokenizer-path: random VQ-VAE", file=sys.stderr)
        vq = JaxVQTokenizer.random_init()
    tok = UnifiedTokenizer(img_tokenizer=vq, text_model_path=args.text_model_path)
    text_source = TsvTextSource(args.text_source)
    img_size = args.img_size or (512 if args.task == "super-resolution" else 256)
    source = open_image_source(args.image_source, img_size=img_size)

    if args.recover_grid:
        import itertools

        import numpy as np

        from ..preprocess.recover_grid import write_recover_grid

        batch = [im for _id, im in itertools.islice(iter(source), args.batch_size)]
        if not batch:
            print("[warn] --recover-grid: image source is empty", file=sys.stderr)
        else:
            write_recover_grid(vq, np.stack(batch), args.recover_grid)
            print(f"recover grid ({len(batch)} images) -> {args.recover_grid}")
        source = open_image_source(args.image_source, img_size=img_size)

    if args.task == "text2image":
        writer = CompactBinaryWriter(args.output)
        n = make_text_image_rows(vq, tok, iter(source), text_source, writer,
                                 batch_size=args.batch_size, log_every=512)
        writer.close()
        print(f"wrote {n} rows -> {args.output} in {time.time()-t0:.1f}s")
    else:
        rows = []
        n = make_super_resolution_rows(
            vq, tok, iter(source), text_source, rows,
            img_size=img_size, sampling_num=args.sampling_num,
            batch_size=args.batch_size,
        )
        IndexedDataset.write(args.output, rows)
        print(f"wrote {n} rows -> {args.output}.bin in {time.time()-t0:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
