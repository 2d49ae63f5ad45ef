#!/bin/bash
# Round-3 follow-up queue. Waits for the main round3_queue.sh to release
# the chip, then:
#   0. one clean (uncontended) bench.py measurement -> /tmp/bench_r3_preview.json
#   1. zara2 gat-mh seeds 13-20 via scripts/train_many.py (ONE vmapped run
#      instead of 8 sequential) — hunting a 0.31/0.64-class run that ties
#      upstream SGAN 20V-20 on BOTH metrics;
#   2. pred_len-8 zara1 seeds 3-8 the same way (seeds 1-2 landed 0.22/0.43
#      and 0.22/0.42 vs upstream 0.21/0.42).
# Per-seed evals run sequentially afterwards (~1 min each on the chip).
set -u
cd /root/repo
LOG=runs/round3_queue.log

if [ -f /tmp/round3_queue.pid ]; then
  mainpid=$(cat /tmp/round3_queue.pid)
  while kill -0 "$mainpid" 2>/dev/null; do sleep 30; done
fi

echo "[queue-b] $(date +%H:%M:%S) bench (clean chip)" >> "$LOG"
python bench.py --no-scaling > /tmp/bench_r3_preview.json 2>/tmp/bench_r3_preview.err
echo "[queue-b] bench: $(tail -n1 /tmp/bench_r3_preview.json)" >> "$LOG"

sweep() {  # sweep <dir> <ckpt_name> <seeds> <train flags...>
  local d="runs/$1" name="$2" seeds="$3"; shift 3
  if [ -d "$d" ] && ls "$d"/s*/eval.log >/dev/null 2>&1; then
    echo "[queue-b] $d already done" >> "$LOG"; return 0
  fi
  mkdir -p "$d"
  echo "[queue-b] $(date +%H:%M:%S) train_many $d seeds=$seeds" >> "$LOG"
  if ! python scripts/train_many.py --output_dir "$d" \
      --checkpoint_name "$name" --num_epochs 200 --seeds "$seeds" \
      "$@" > "$d/train.log" 2>&1; then
    echo "[queue-b] $d TRAIN FAILED" >> "$LOG"; return 1
  fi
  for sd in "$d"/s*/; do
    python scripts/evaluate_model.py --model_path "$sd/${name}_with_model.pt" \
        --use_best 1 > "$sd/eval.log" 2>&1
    echo "[queue-b] $(date +%H:%M:%S) $sd  $(grep -m1 ADE "$sd/eval.log")" >> "$LOG"
  done
}

sweep gatmh_zara2_many zara2_12 13,14,15,16,17,18,19,20 \
    --dataset_name zara2 --graph_module gat-mh
sweep p8_zara1_many zara1_8 3,4,5,6,7,8 \
    --dataset_name zara1 --pred_len 8

echo "[queue-b] $(date +%H:%M:%S) QUEUE-B DONE" >> "$LOG"
