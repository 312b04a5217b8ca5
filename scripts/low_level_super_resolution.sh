#!/bin/bash
# 128px-conditioned low-level SR (reference scripts/low_level_super_resolution.sh
# analog): '<text> <tab> <128px image path>' per input line
python -m cogview_tpu.cli.generate \
  --preset cogview-sr \
  --generation-task "low-level super-resolution" \
  --input-source "${1:-input_llsr.txt}" \
  --output-path samples/low_level_sr \
  --load "${CKPT:-checkpoints/cogview-sr}" \
  --img-tokenizer-path "${VQVAE:-pretrained/vqvae/vqvae_hard_biggerset_011.pt}" \
  --batch-size 4 --max-inference-batch-size 4 \
  --temperature 1.02 --top_k 200
