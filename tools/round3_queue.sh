#!/bin/bash
# Round-3 training queue (VERDICT r2 items 2-4), run serially on the one
# v5e chip:
#   1. zara2 gat-mh seed extension — hunting a 0.31/0.64-class run that
#      ties upstream SGAN 20V-20 on BOTH metrics (seed 3 = 0.31/0.66 ties
#      ADE only, seed 2 = 0.32/0.64 ties FDE only);
#   2. the 8-step-horizon zoo (--pred_len 8) on all five scenes
#      (upstream ADE8/FDE8: eth 0.58/1.13, hotel 0.36/0.71, univ
#      0.33/0.70, zara1 0.21/0.42, zara2 0.21/0.42);
#   3. from-scratch proof runs for the sgan / sgan-p / gcn presets on
#      zara1 (import-side targets ~0.34/0.69, 0.35/0.69, 0.35/0.70).
#
# Usage: tools/round3_queue.sh [phase]   phase in {zara2,p8,presets,all}
set -u
cd /root/repo
mkdir -p runs
LOG=runs/round3_queue.log
phase="${1:-all}"

run_job() {  # run_job <dir> <ckpt_name> <train flags...>
  local d="runs/$1" name="$2"; shift 2
  mkdir -p "$d"
  if [ -f "$d/eval.log" ] && grep -q ADE "$d/eval.log"; then
    echo "[queue] $d already done: $(grep -m1 ADE "$d/eval.log")" >> "$LOG"
    return 0
  fi
  echo "[queue] $(date +%H:%M:%S) train $d" >> "$LOG"
  if ! python scripts/train.py --output_dir "$d" --checkpoint_name "$name" \
      --num_epochs 200 "$@" > "$d/train.log" 2>&1; then
    echo "[queue] $d TRAIN FAILED" >> "$LOG"; return 1
  fi
  python scripts/evaluate_model.py --model_path "$d/${name}_with_model.pt" \
      --use_best 1 > "$d/eval.log" 2>&1
  echo "[queue] $(date +%H:%M:%S) $d  $(grep -m1 ADE "$d/eval.log")" >> "$LOG"
}

if [ "$phase" = zara2 ] || [ "$phase" = all ]; then
  for s in 7 8 9 10 11 12; do
    run_job "gatmh_zara2_s$s" zara2_12 --dataset_name zara2 \
        --graph_module gat-mh --seed "$s"
  done
fi

if [ "$phase" = p8 ] || [ "$phase" = all ]; then
  for scene in zara1 zara2 hotel univ eth; do
    for s in 1 2; do
      run_job "p8_${scene}_s$s" "${scene}_8" --dataset_name "$scene" \
          --pred_len 8 --seed "$s"
    done
  done
fi

if [ "$phase" = presets ] || [ "$phase" = all ]; then
  run_job preset_sgan_zara1 zara1_12 --dataset_name zara1 \
      --pooling_type none --graph_module none --seed 1
  run_job preset_sganp_zara1 zara1_12 --dataset_name zara1 \
      --graph_module none --seed 1
  run_job preset_gcn_zara1 zara1_12 --dataset_name zara1 \
      --graph_module gcn --seed 1
fi

echo "[queue] $(date +%H:%M:%S) QUEUE DONE ($phase)" >> "$LOG"
