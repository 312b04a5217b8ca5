#!/bin/bash
# text2image generation with cogview-base (reference scripts/text2image.sh analog)
python -m cogview_tpu.cli.generate \
  --preset cogview-base \
  --generation-task text2image \
  --input-source "${1:-input.txt}" \
  --output-path samples/text2image \
  --load "${CKPT:-checkpoints/cogview-base}" \
  --img-tokenizer-path "${VQVAE:-pretrained/vqvae/vqvae_hard_biggerset_011.pt}" \
  --batch-size 8 --max-inference-batch-size 8 \
  --temperature 1.0 --top_k 200
