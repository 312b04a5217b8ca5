#!/bin/bash
# model-parallel=2 pretraining step benchmark (BASELINE.md config 5)
python -m cogview_tpu.cli.pretrain \
  --preset tutorial \
  --model-parallel-size 2 \
  --train-data "${DATA:-data/bird_animal_t2i.bin}" \
  --train-iters 100 --batch-size 8 --log-interval 10
