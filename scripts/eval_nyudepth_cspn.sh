#!/bin/bash
# Canonical NYU eval (parity with reference eval_nyudepth_cspn.sh:10-16),
# with the README's 5-run sparse-resample averaging automated (--runs 5).
set -e
NORM=${NORM:-8sum}   # 8sum (non-pos affinity) | 8sum_abs (pos affinity)
python -m cspn_tpu eval \
  --preset nyu_eval \
  --data-set nyudepth \
  --n-sample 500 \
  --batch-size-eval 1 \
  --cspn-step 24 \
  --cspn-norm-type "$NORM" \
  --runs 5 \
  --dump-images \
  "$@"
