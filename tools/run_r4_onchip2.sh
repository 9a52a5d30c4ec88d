#!/bin/bash
# Round-4 on-chip queue #2: backward attribution + floor attribution.
#   bash tools/run_r4_onchip2.sh 2>&1 | tee /tmp/r4_onchip2.log
set -x
cd "$(dirname "$0")/.."

# 1. prior backward attribution (VERDICT r3 #2): fgc vs blockdiag vs
#    hybrid (dense fwd/dgrad + fgc wgrad) conv gradients at the two
#    blockdiag-active shapes, then BN train-mode grad cost
timeout 4800 python tools/probe_prior_bwd.py --batch 20 --dtype bfloat16 --skip_bn
timeout 4800 python tools/probe_prior_bwd.py --batch 20 --dtype bfloat16 --skip_conv

# 2. MXU floor attribution (VERDICT r3 #5): ceiling vs W=256 chain vs
#    width/batch sweeps, one session
timeout 3600 python tools/probe_mxu_floor.py
