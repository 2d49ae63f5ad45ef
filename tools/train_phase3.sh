#!/usr/bin/env bash
# Phase 3: variant configs + a longer univ run.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p runs/gcn_zara1 runs/gatmh_univ runs/univ400
python scripts/train_GCN.py --dataset_name zara1 --num_epochs 200 \
  --checkpoint_every 300 --print_every 500 \
  --output_dir runs/gcn_zara1 --checkpoint_name zara1_12 \
  > runs/gcn_zara1/train.log 2>&1
python scripts/evaluate_model.py \
  --model_path runs/gcn_zara1/zara1_12_with_model.pt --use_best 1 \
  --num_samples 20 > runs/gcn_zara1/eval.log 2>&1
python scripts/train.py --dataset_name univ --num_epochs 200 \
  --graph_module gat-mh --checkpoint_every 300 --print_every 500 \
  --output_dir runs/gatmh_univ --checkpoint_name univ_12 \
  > runs/gatmh_univ/train.log 2>&1
python scripts/evaluate_model.py \
  --model_path runs/gatmh_univ/univ_12_with_model.pt --use_best 1 \
  --num_samples 20 > runs/gatmh_univ/eval.log 2>&1
python scripts/train.py --dataset_name univ --num_epochs 500 --seed 3 \
  --checkpoint_every 300 --print_every 500 \
  --output_dir runs/univ400 --checkpoint_name univ_12 \
  > runs/univ400/train.log 2>&1
python scripts/evaluate_model.py \
  --model_path runs/univ400/univ_12_with_model.pt --use_best 1 \
  --num_samples 20 > runs/univ400/eval.log 2>&1
echo DONE > runs/PHASE3_DONE
