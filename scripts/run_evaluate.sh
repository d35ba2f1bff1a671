#!/bin/bash
# Per-gene significance tables from test_results.pkl files
# (reference evaluation/evaluate_model.py driver)
python3 -m sequoia_tpu.cli.evaluate_model --model_dir saved_exp/TCGA
