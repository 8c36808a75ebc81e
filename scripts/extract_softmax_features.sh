#!/usr/bin/env bash
# Extract softmax features (T per main config) for every dataset split.
# Mirrors the reference protocol driver (reference: scripts/extract_softmax_features.sh).
set -e
method=${method:-hard_em_dirichlet}
for dataset in sun397 caltech101 food101 ucf101 flowers102 dtd eurosat fgvcaircraft oxfordpets stanfordcars imagenet; do
    python main.py --opts batch_size 1 number_tasks 1 dataset ${dataset} shots 0 \
        use_softmax_feature True method ${method}
done
