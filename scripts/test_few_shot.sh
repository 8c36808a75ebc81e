#!/usr/bin/env bash
# Paper protocol: 1000 few-shot tasks (default 4-shot), batches of 100.
# (reference: scripts/test_few_shot.sh)
set -e
n_query=75
s=${shots:-4}
for method in hard_em_dirichlet em_dirichlet paddle alpha_tim laplacian_shot bdcspn; do
  for dataset in "$@"; do
    python main.py --opts batch_size 100 number_tasks 1000 dataset ${dataset} shots ${s} \
        n_query ${n_query} save_results True seed 0 method ${method} \
        used_test_set test use_softmax_feature True
  done
done
