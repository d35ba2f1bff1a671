#!/bin/bash
# ResNet-50 feature extraction (reference scripts/extract_resnet_features.sh)
# --weights: path to a torchvision resnet50 ImageNet state dict (.pth)
python3 -m sequoia_tpu.cli.compute_features \
    --feat_type resnet \
    --ref_file examples/ref_file.csv \
    --patch_data_path examples/Patches_hdf5 \
    --feature_path examples/features \
    --weights "${RESNET50_WEIGHTS:-random}" \
    --batch_size 256
