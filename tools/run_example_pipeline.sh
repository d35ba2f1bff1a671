#!/bin/bash
# End-to-end smoke run on synthetic data: WSIs -> tiles -> features ->
# k-means -> 2-fold CV training -> per-gene evaluation.
#
# FULL=1 tools/run_example_pipeline.sh   runs the chain at the REFERENCE
# width: the real 20,820-gene list is imported from a sequoia-pub checkout
# (REFERENCE=/root/reference by default) and every stage — training CV,
# all_genes.csv evaluation, serving — runs over the full panel.
# SEQUOIA_JAX_PLATFORM=cpu pins every stage to host CPU (useful where the TPU
# plugin is flaky or absent).
set -e
OUT=${1:-/tmp/sequoia_example}
FULL=${FULL:-0}
REFERENCE=${REFERENCE:-/root/reference}
rm -rf "$OUT" && mkdir -p "$OUT"

GENE_ARGS=(--n_genes 50)
if [ "$FULL" = "1" ]; then
    python tools/import_reference_artifacts.py --reference "$REFERENCE" \
        --out "$OUT/ref_artifacts"
    GENE_ARGS=(--gene_list "$OUT/ref_artifacts/examples/gene_list.csv" \
               --n_genes -1)
fi

python tools/make_example_data.py --out "$OUT" --n_slides 12 \
    "${GENE_ARGS[@]}" --wsis

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
