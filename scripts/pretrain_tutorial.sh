#!/bin/bash
# tutorial-scale pretraining (reference scripts/pretrain_single_node.sh analog)
# On a TPU pod slice this same command runs SPMD across all chips
# (jax.distributed initializes from the TPU runtime; no hostfiles/ssh).
python -m cogview_tpu.cli.pretrain \
  --preset tutorial \
  --train-data "${DATA:-data/bird_animal_t2i.bin}" \
  --dataset-type CompactBinaryDataset \
  --train-iters 20000 --batch-size 96 \
  --lr 2e-4 --lr-decay-style cosine --warmup 0.1 \
  --txt-loss-scale 5 \
  --save checkpoints/tutorial --save-interval 2000 \
  --eval-interval 1000 --log-interval 100 \
  --summary-dir runs
