#!/bin/bash
# QUALITY_r2 evidence runs on the real chip (run after bench.py frees it).
# Real Criteo/ML-1M are unreachable (no egress) — these are the
# calibrated-synthetic stand-ins; see QUALITY_r2.md.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site

# DLRM on Criteo-Kaggle-calibrated synthetic: published cardinalities
# (capped 1M), Zipf ids, published CTR, Bayes AUROC ceiling ~0.78.
python examples/dlrm_main.py --synthetic_criteo \
  --batch_size 8192 --num_batches 2000 --embedding_dim 64 \
  --learning_rate 1.0 --dense_learning_rate 0.1 \
  --validation_freq_within_epoch 500 \
  2>&1 | grep -v WARNING | tail -12

# BERT4Rec on ML-1M-calibrated synthetic sequences.
python examples/bert4rec_main.py --synthetic_ml1m \
  --batch_size 128 --num_batches 1500 --epochs 3 \
  --max_len 64 --emb_dim 64 --num_layers 2 --nhead 2 \
  2>&1 | grep -v WARNING | tail -8
