#!/bin/bash
# 256->512 sliding-window super-resolution (reference scripts/super_resolution.sh analog)
python -m cogview_tpu.cli.generate \
  --preset cogview-sr \
  --generation-task super-resolution \
  --input-source "${1:-input_sr.txt}" \
  --output-path samples/sr \
  --load "${CKPT:-checkpoints/cogview-sr}" \
  --img-tokenizer-path "${VQVAE:-pretrained/vqvae/vqvae_hard_biggerset_011.pt}"
