#!/bin/bash
# caption-likelihood reranking (reference post-selection task)
python -m cogview_tpu.cli.generate \
  --preset cogview-base \
  --generation-task post-selection \
  --input-source "${1:-candidates.txt}" \
  --output-path samples/scores \
  --load "${CKPT:-checkpoints/cogview-caption}" \
  --img-tokenizer-path "${VQVAE:-pretrained/vqvae/vqvae_hard_biggerset_011.pt}"
