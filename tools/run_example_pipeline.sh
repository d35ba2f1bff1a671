#!/bin/bash
# End-to-end smoke run on synthetic data: WSIs -> tiles -> features ->
# k-means -> 2-fold CV training -> per-gene evaluation.
set -e
OUT=${1:-/tmp/sequoia_example}
rm -rf "$OUT" && mkdir -p "$OUT"

python tools/make_example_data.py --out "$OUT" --n_slides 12 --n_genes 50 --wsis

python -m sequoia_tpu.cli.patch_gen \
    --wsi_path "$OUT/HE" --patch_path "$OUT/patches" --mask_path "$OUT/patches" \
    --patch_size 64 --max_patches_per_slide 60

python -m sequoia_tpu.cli.compute_features --feat_type resnet \
    --ref_file "$OUT/ref_file.csv" --patch_data_path "$OUT/patches" \
    --feature_path "$OUT/features" --weights random --batch_size 32 \
    --max_patch_number 48

python -m sequoia_tpu.cli.kmean_features --ref_file "$OUT/ref_file.csv" \
    --feature_path "$OUT/features" --num_clusters 8

python -m sequoia_tpu.cli.main --ref_file "$OUT/ref_file.csv" \
    --feature_path "$OUT/features" --model_type vis --depth 1 --num-heads 2 \
    --k 2 --batch_size 4 --num_epochs 2 --train \
    --save_dir "$OUT/exp" --cohort syn --exp_name demo

python -m sequoia_tpu.cli.evaluate_model --model_dir "$OUT/exp/syn" \
    --cancers demo --folds 2 --save_path "$OUT/results"

# one-shot serving through the streaming predictor (same checkpoints)
python -m sequoia_tpu.cli.serve --wsi "$OUT"/HE/*.tiff \
    --checkpoints "$OUT/exp/syn/demo" --weights random --batch_size 32 \
    --compute_dtype float32 --max_patches 48 --patch_size 64 \
    --num_clusters 8 --out "$OUT/results/predictions.csv"

echo "--- results ---"
ls "$OUT/results"
