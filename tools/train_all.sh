#!/usr/bin/env bash
# Sequential training queue: remaining ETH/UCY scenes, then Bo20 eval of
# every trained checkpoint, then the reference-checkpoint parity sweep.
set -uo pipefail
cd "$(dirname "$0")/.."
for scene in eth hotel univ zara2; do
  mkdir -p runs/$scene
  python scripts/train.py --dataset_name $scene --num_epochs 200 \
    --checkpoint_every 300 --print_every 200 \
    --output_dir runs/$scene --checkpoint_name ${scene}_12 \
    > runs/$scene/train.log 2>&1
done
for scene in zara1 eth hotel univ zara2; do
  python scripts/evaluate_model.py \
    --model_path runs/$scene/${scene}_12_with_model.pt --use_best 1 \
    --num_samples 20 > runs/$scene/eval.log 2>&1
done
python tools/parity_eval.py --num_samples 20 > runs/parity.log 2>&1
echo ALL_DONE > runs/QUEUE_DONE
