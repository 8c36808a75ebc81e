#!/usr/bin/env bash
# Extract L2-normalized visual embeddings for every dataset split.
set -e
method=${method:-hard_kmeans}
for dataset in sun397 caltech101 food101 ucf101 flowers102 dtd eurosat fgvcaircraft oxfordpets stanfordcars imagenet; do
    python main.py --opts batch_size 1 number_tasks 1 dataset ${dataset} shots 0 \
        use_softmax_feature False method ${method}
done
