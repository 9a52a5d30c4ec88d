#!/bin/bash
# Round-4: re-run the reference's FULL 500k-iteration schedule at flagship
# N_rand=1024 with the bf16-activation NeRF (round-3 measured 3h13m at
# 22.8 ms/step; the round-4 chained slope predicts ~13.6 ms/step → <2 h).
# Scene: 8-view 468x624 synthetic, K=20 (tools/make_synthetic_scene.py).
#   bash tools/run_r4_500k.sh 2>&1 | tee /tmp/r4_500k.log
set -x
cd "$(dirname "$0")/.."

date -Is
timeout 14400 python run_scade_scannet.py train \
  --data_dir /tmp --scene_id scene500k --ckpt_dir /tmp/ckpt_500k_r4 \
  --num_iterations 500000 --N_rand 1024 --N_samples 64 --N_importance 128 \
  --multires 9 --num_hypothesis 20 --compute_dtype bfloat16 \
  --i_weights 100000 2>&1 | grep -vE "^WARNING" | tail -400
date -Is
timeout 3600 python run_scade_scannet.py test \
  --data_dir /tmp --scene_id scene500k --ckpt_dir /tmp/ckpt_500k_r4 \
  --N_rand 1024 --N_samples 64 --N_importance 128 \
  --multires 9 --num_hypothesis 20 --compute_dtype bfloat16 2>&1 | tail -40
date -Is
echo "=== r4 500k DONE ==="
