#!/bin/bash
# 5-fold pretrained-weight ensemble inference on an independent cohort
# (reference evaluation/predict_independent_dataset.py driver)
python3 -m sequoia_tpu.cli.predict_independent \
    --ref_file cohort_ref_file.csv \
    --feature_path features \
    --tcga_project TCGA-BRCA \
    --save_dir results --exp_name independent
