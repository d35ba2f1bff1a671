#!/bin/bash
# GTEx pretraining (reference src/pretrain_gtex.py driver)
python3 -m sequoia_tpu.cli.pretrain_gtex \
    --path_csv examples/gtex_ref_file.csv \
    --feature_path examples/features \
    --model vis --num_epochs 200 --batch_size 16
