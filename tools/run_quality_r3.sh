#!/bin/bash
# QUALITY_r3 evidence runs on the real chip (run after bench.py frees it).
# fp32 vs int8 vs int4 served AUROC on one synthetic-Criteo eval stream
# (VERDICT r2 item 7), plus the BERT4Rec lr investigation at chip scale.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site

timeout 3600 python tools/quality_quant_r3.py --batch_size 8192 --num_batches 4000 \
  --max_ind_range 1000000 --eval_batches 40 2>&1 | grep -v WARNING | tail -12

# BERT4Rec epoch-0-peak investigation: best config from the CPU sweep
# (lr=3e-3 with a hotter sparse emb_lr gives a rising HR@10 curve),
# rerun at the r2 scale for the quality table
for elr in 0.01 0.03; do
  timeout 2400 python examples/bert4rec_main.py --synthetic_ml1m \
    --batch_size 128 --num_batches 1500 --epochs 3 \
    --max_len 64 --emb_dim 64 --num_layers 2 --nhead 2 \
    --lr 0.003 --emb_lr $elr \
    2>&1 | grep -E "HR@10|loss" | tail -6
done
