#!/bin/bash
# Canonical NYU training run (parity with reference train_cspn_nyu.sh:5-16:
# nyudepth, cspn_unet resnet50, 500 sparse samples, bs 8, 40 epochs,
# adaptive lr, 8sum norm, nesterov).
set -e
python -m cspn_tpu train \
  --preset nyu_train \
  --data-set nyudepth \
  --n-sample 500 \
  --batch-size-train 8 \
  --num-epoch 40 \
  --cspn-step 24 \
  --cspn-norm-type 8sum \
  --save-dir result/nyu_pretrain_cspn_1_net_cp500_bs8_adlr_ep40_8norm \
  --best-model-dir result/nyu_pretrain_cspn_1_net_cp500_bs8_adlr_ep40_8norm \
  "$@"
