#!/bin/bash
# Round-3 queue C (after queue-b): close the remaining 8-step gaps.
#   - univ p8: default config landed 0.36/0.72 vs upstream 0.33/0.70; at
#     12 steps univ only reached upstream via the gat-mh graph module, so
#     sweep gat-mh seeds (plus two more default seeds for the record);
#   - eth p8: 0.59/1.14 vs 0.58/1.13 — extend the default-config sweep.
set -u
cd /root/repo
LOG=runs/round3_queue.log

if [ -f /tmp/round3_queue_b.pid ]; then
  bpid=$(cat /tmp/round3_queue_b.pid)
  while kill -0 "$bpid" 2>/dev/null; do sleep 30; done
fi

sweep() {  # sweep <dir> <ckpt_name> <seeds> <train flags...>
  local d="runs/$1" name="$2" seeds="$3"; shift 3
  if [ -d "$d" ] && ls "$d"/s*/eval.log >/dev/null 2>&1; then
    echo "[queue-c] $d already done" >> "$LOG"; return 0
  fi
  mkdir -p "$d"
  echo "[queue-c] $(date +%H:%M:%S) train_many $d seeds=$seeds" >> "$LOG"
  if ! python scripts/train_many.py --output_dir "$d" \
      --checkpoint_name "$name" --num_epochs 200 --seeds "$seeds" \
      "$@" > "$d/train.log" 2>&1; then
    echo "[queue-c] $d TRAIN FAILED" >> "$LOG"; return 1
  fi
  for sd in "$d"/s*/; do
    python scripts/evaluate_model.py --model_path "$sd/${name}_with_model.pt" \
        --use_best 1 > "$sd/eval.log" 2>&1
    echo "[queue-c] $(date +%H:%M:%S) $sd  $(grep -m1 ADE "$sd/eval.log")" >> "$LOG"
  done
}

sweep p8_univ_gatmh_many univ_8 1,2,3,4 \
    --dataset_name univ --pred_len 8 --graph_module gat-mh
sweep p8_eth_many eth_8 3,4,5,6,7,8 \
    --dataset_name eth --pred_len 8

echo "[queue-c] $(date +%H:%M:%S) QUEUE-C DONE" >> "$LOG"
