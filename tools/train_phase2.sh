#!/usr/bin/env bash
# Phase 2: seed sweep with the chunked loop (keep-best), plus the GCNPooling
# (train_GCN) and gat-mh (sgangat-g-p style) variant configs.
set -uo pipefail
cd "$(dirname "$0")/.."
for seed in 1 2; do
  for scene in univ eth hotel zara1 zara2; do
    out=runs/s${seed}_${scene}
    mkdir -p $out
    python scripts/train.py --dataset_name $scene --num_epochs 200 \
      --checkpoint_every 300 --print_every 500 --seed $seed \
      --output_dir $out --checkpoint_name ${scene}_12 \
      > $out/train.log 2>&1
    python scripts/evaluate_model.py \
      --model_path $out/${scene}_12_with_model.pt --use_best 1 \
      --num_samples 20 > $out/eval.log 2>&1
  done
done
# GCNPooling variant (reference train_GCN recorded config: zara1)
mkdir -p runs/gcn_zara1
python scripts/train_GCN.py --dataset_name zara1 --num_epochs 200 \
  --checkpoint_every 300 --print_every 500 \
  --output_dir runs/gcn_zara1 --checkpoint_name zara1_12 \
  > runs/gcn_zara1/train.log 2>&1
python scripts/evaluate_model.py \
  --model_path runs/gcn_zara1/zara1_12_with_model.pt --use_best 1 \
  --num_samples 20 > runs/gcn_zara1/eval.log 2>&1
# gat-mh variant (sgangat-g-p config: univ)
mkdir -p runs/gatmh_univ
python scripts/train.py --dataset_name univ --num_epochs 200 \
  --graph_module gat-mh --checkpoint_every 300 --print_every 500 \
  --output_dir runs/gatmh_univ --checkpoint_name univ_12 \
  > runs/gatmh_univ/train.log 2>&1
python scripts/evaluate_model.py \
  --model_path runs/gatmh_univ/univ_12_with_model.pt --use_best 1 \
  --num_samples 20 > runs/gatmh_univ/eval.log 2>&1
echo DONE > runs/PHASE2_DONE
