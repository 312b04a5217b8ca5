#!/bin/bash
# image captioning with cogview-caption (reference scripts/image2text.sh analog)
python -m cogview_tpu.cli.generate \
  --preset cogview-base \
  --generation-task image2text \
  --input-source "${1:-input_i2t.txt}" \
  --output-path samples/image2text \
  --load "${CKPT:-checkpoints/cogview-caption}" \
  --img-tokenizer-path "${VQVAE:-pretrained/vqvae/vqvae_hard_biggerset_011.pt}" \
  --batch-size 8 --max-inference-batch-size 8 \
  --temperature 1.0 --top_k 200
