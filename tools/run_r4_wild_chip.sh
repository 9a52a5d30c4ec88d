#!/bin/bash
# VERDICT r3 #8: the wild/TnT variant end-to-end ON THE CHIP at production
# shapes (multires 9, 64+128 samples, K=20, N_rand=1024, mask_edges), then
# the video task producing a playable file.
#   bash tools/run_r4_wild_chip.sh 2>&1 | tee /tmp/r4_wild.log
set -x
cd "$(dirname "$0")/.."

SCENE=/tmp/hh32_scene
CKPT=/tmp/ckpt_wild_r4

timeout 10800 python run_scade_wild.py train \
  --data_dir /tmp --scene_id hh32_scene --ckpt_dir "$CKPT" \
  --expname wild_r4 --num_iterations 2000 --N_rand 1024 \
  --N_samples 64 --N_importance 128 --num_hypothesis 20 \
  --cimle_dir dump --mask_edges true --compute_dtype bfloat16 \
  --i_weights 2000 --i_img 1000000 --i_print 200

timeout 7200 python run_scade_wild.py video \
  --data_dir /tmp --scene_id hh32_scene --ckpt_dir "$CKPT" \
  --expname wild_r4 --N_samples 64 --N_importance 128 \
  --num_hypothesis 20 --cimle_dir dump

ls -la "$CKPT/wild_r4/" | tail -5
