#!/bin/bash
# Univ flagship seed sweep (VERDICT r1 item 7): default scripts/train.py
# config with varied seeds, each evaluated best-of-20 on the test split.
#
# Usage: tools/sweep_univ.sh [seed ...]     (default: 1..13)
# The recorded 13-seed sweep in models/grouptraj/PROVENANCE.json was run
# as seed 1 (round 1) plus batches 2-7 and 8-13 of this script.
set -u
cd /root/repo
mkdir -p runs
seeds=("$@")
[ ${#seeds[@]} -eq 0 ] && seeds=(1 2 3 4 5 6 7 8 9 10 11 12 13)
for s in "${seeds[@]}"; do
  d="runs/univ_s$s"
  mkdir -p "$d"
  echo "=== seed $s train ==="
  if ! python scripts/train.py --dataset_name univ --num_epochs 200 \
      --seed "$s" --output_dir "$d" --checkpoint_name univ_12 \
      > "$d/train.log" 2>&1; then
    echo "seed $s: TRAIN FAILED (see $d/train.log)"; continue
  fi
  echo "=== seed $s eval ==="
  python scripts/evaluate_model.py \
      --model_path "$d/univ_12_with_model.pt" --use_best 1 \
      > "$d/eval.log" 2>&1
  grep -h "ADE" "$d/eval.log" | head -1
done
echo "SWEEP DONE"
