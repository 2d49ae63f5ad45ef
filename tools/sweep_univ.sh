#!/bin/bash
# Univ flagship seed sweep (VERDICT r1 item 7): default scripts/train.py
# config, seeds varied; evaluates best-of-20 on the test split after each.
set -u
cd /root/repo
mkdir -p runs
for s in 2 3 4 5 6 7; do
  echo "=== seed $s train ==="
  python scripts/train.py --dataset_name univ --num_epochs 200 \
      --seed "$s" --output_dir "runs/univ_s$s" \
      --checkpoint_name "univ_12" 2>&1 | tail -2
  echo "=== seed $s eval ==="
  python scripts/evaluate_model.py \
      --model_path "runs/univ_s$s/univ_12_with_model.pt" --use_best 1 2>&1 | tail -3
done
echo "SWEEP DONE"
