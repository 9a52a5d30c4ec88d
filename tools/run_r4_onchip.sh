#!/bin/bash
# Round-4 on-chip measurement queue (VERDICT r3 next-round #1 and #4).
#   bash tools/run_r4_onchip.sh 2>&1 | tee /tmp/r4_onchip.log
set -x
cd "$(dirname "$0")/.."

# 1. render bench A/B: per-site auto (new default) vs the round-3 global
#    bucketed vs masked — expect auto >= ~222k rays/s (both probe wins)
timeout 2400 python bench.py
SCADE_SAMPLE_PDF=bucketed timeout 2400 python bench.py
SCADE_SAMPLE_PDF=masked timeout 2400 python bench.py

# 2. the owed full-cast bf16 prior numbers (round-3 harness bug fixed:
#    tools/bench_prior.py perturbed() keeps x.dtype)
timeout 2400 python tools/bench_prior.py --batch 5 --precision bfloat16 --compute_dtype bfloat16
timeout 3600 python tools/bench_prior.py --batch 20 --precision bfloat16 --compute_dtype bfloat16

# 3. the interrupted B=20 blockdiag trainer-step A/B (pre-blockdiag was
#    621 ms donated; r3 partial log showed 593 ms f32) + mixed precision
timeout 3600 python tools/bench_prior.py --batch 20 --precision bfloat16
