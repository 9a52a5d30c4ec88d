#!/bin/bash
# VERDICT r3 #3: OUR side of the dense-view (32-train-view) training-
# dynamics head-to-head — 3 seeds, 2000 full-width iterations, matching
# tools/run_reference_training.py's fixed hyperparameters exactly
# (N_rand 256, 64+128 samples, K=20, multires 9, lrate 5e-4).
#   bash tools/run_r4_hh32_ours.sh 2>&1 | tee /tmp/r4_hh32_ours.log
set -x
cd "$(dirname "$0")/.."

for SEED in 0 1 2; do
  timeout 10800 python run_scade_scannet.py train \
    --data_dir /tmp --scene_id hh32_scene \
    --ckpt_dir /tmp/ours32_s$SEED --expname ours32 \
    --num_iterations 2000 --N_rand 256 \
    --N_samples 64 --N_importance 128 --num_hypothesis 20 \
    --cimle_dir dump --seed $SEED \
    --i_weights 2000 --i_img 1000000 --i_print 400
  cat /tmp/ours32_s$SEED/ours32/test_images_hh32_scene/metrics.txt
done
