#!/bin/bash
# Round-3 queue D: generator-EMA retrains for the remaining tie cells
# (MODEL_ZOO vs upstream SGAN 20V-20):
#   - eth 12:   0.69/1.29 vs 0.71/1.29  (FDE tie)   -> runs/eth_ema (launched separately)
#   - zara1 12: 0.34/0.67 vs 0.34/0.69  (ADE tie)
#   - zara1 8:  0.21/0.42 vs 0.21/0.42  (both tie)
#   - univ 8:   0.33/0.67 vs 0.33/0.70  (ADE tie; gat-mh like its 12-step default)
# EMA closed the same kind of gap on univ-12 and zara2-12 (PROVENANCE).
set -u
cd /root/repo
LOG=runs/round3_queue_d.log

# gate on the already-running eth_ema train_many (PID passed as $1)
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

evaldir() {  # evaldir <dir> <ckpt_name>: exact Bo20 for raw + EMA weights
  local d="$1" name="$2"
  for sd in "$d"/s*/; do
    [ -f "$sd/${name}_with_model.pt" ] || continue
    timeout 1800 python tools/exact_eval.py "$sd/${name}_with_model.pt" \
        --use_ema 1 > "$sd/eval_ema.log" 2>&1
    timeout 1800 python tools/exact_eval.py "$sd/${name}_with_model.pt" \
        > "$sd/eval_raw.log" 2>&1
    echo "[queue-d] $(date +%H:%M:%S) $sd ema=$(tail -1 "$sd/eval_ema.log") raw=$(tail -1 "$sd/eval_raw.log")" >> "$LOG"
  done
}

sweep() {  # sweep <dir> <ckpt_name> <seeds> <train flags...>
  local d="runs/$1" name="$2" seeds="$3"; shift 3
  if [ -d "$d" ] && ls "$d"/s*/eval_ema.log >/dev/null 2>&1; then
    echo "[queue-d] $d already done" >> "$LOG"; return 0
  fi
  mkdir -p "$d"
  echo "[queue-d] $(date +%H:%M:%S) train_many $d seeds=$seeds" >> "$LOG"
  if ! timeout 5400 python scripts/train_many.py --output_dir "$d" \
      --checkpoint_name "$name" --num_epochs 200 --seeds "$seeds" \
      --g_ema_decay 0.999 "$@" > "$d/train.log" 2>&1; then
    echo "[queue-d] $d TRAIN FAILED" >> "$LOG"; return 1
  fi
  evaldir "$d" "$name"
}

evaldir runs/eth_ema checkpoint

sweep zara1_ema checkpoint 1,2,3,4 --dataset_name zara1
sweep p8_zara1_ema zara1_8 1,2,4,8 --dataset_name zara1 --pred_len 8
sweep p8_univ_gatmh_ema univ_8 10,11,12,13 \
    --dataset_name univ --pred_len 8 --graph_module gat-mh

echo "[queue-d] $(date +%H:%M:%S) QUEUE-D DONE" >> "$LOG"
