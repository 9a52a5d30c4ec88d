#!/bin/bash
# Pending on-chip measurements queued during the round-3 tunnel outage.
# Run (background, generous timeout) the moment the chip is reachable:
#   bash tools/run_r3_pending.sh 2>&1 | tee /tmp/r3_pending.log
set -x
cd "$(dirname "$0")/.."

# 1. bucketed vs masked vs onehot inverse-CDF at both sites (M=63, 191)
timeout 2400 python tools/probe_sample_pdf.py

# 2. render bench A/B: masked (default) vs bucketed end to end
timeout 2400 python bench.py
SCADE_SAMPLE_PDF=bucketed timeout 2400 python bench.py

# 3. prior fwd with the full-cast bf16 path (vs the 35.1/118.8 ms
#    matmul-precision-only numbers, BASELINE.md r3 grouped-conv section)
timeout 2400 python tools/bench_prior.py --batch 5 --precision bfloat16 --compute_dtype bfloat16
timeout 3600 python tools/bench_prior.py --batch 20 --precision bfloat16 --compute_dtype bfloat16

# 4. the interrupted B=20 blockdiag train-step A/B (prior step was 621 ms
#    pre-blockdiag) + the mixed-precision trainer step
timeout 3600 python tools/bench_prior.py --batch 20 --precision bfloat16
