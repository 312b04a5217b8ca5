#!/bin/bash
# images + captions -> CompactBinary training corpus
python -m cogview_tpu.cli.preprocess \
  --task text2image \
  --image-source "${1:?images dir/zip/tar/h5}" \
  --text-source "${2:?captions tsv/json}" \
  --img-tokenizer-path "${VQVAE:-pretrained/vqvae/vqvae_hard_biggerset_011.pt}" \
  --output "${3:-data/corpus_t2i.bin}"
