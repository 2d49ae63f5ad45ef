#!/usr/bin/env bash
# Example full-flag invocation (counterpart of reference scripts/run_traj.sh):
# trains the group-aware GAT Social-GAN on zara1 with the reference's
# recorded hyperparameters, then evaluates best-of-20 ADE/FDE.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${OUT:-runs/zara1}
mkdir -p "$OUT"

python scripts/train.py \
  --dataset_name zara1 \
  --delim tab \
  --obs_len 8 \
  --pred_len 12 \
  --batch_size 64 \
  --num_epochs 200 \
  --embedding_dim 16 \
  --mlp_dim 64 \
  --encoder_h_dim_g 32 \
  --decoder_h_dim_g 32 \
  --encoder_h_dim_d 48 \
  --noise_dim 8 \
  --noise_type gaussian \
  --noise_mix_type global \
  --pooling_type pool_net \
  --pool_every_timestep 0 \
  --bottleneck_dim 8 \
  --d_type global \
  --g_learning_rate 1e-4 \
  --d_learning_rate 1e-3 \
  --d_steps 1 \
  --g_steps 1 \
  --clipping_threshold_g 2.0 \
  --best_k 20 \
  --l2_loss_weight 1 \
  --checkpoint_every 300 \
  --print_every 100 \
  --output_dir "$OUT" \
  --checkpoint_name zara1_12

python scripts/evaluate_model.py --model_path "$OUT/zara1_12_with_model.pt" --num_samples 20
