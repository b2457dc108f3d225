#!/bin/bash
# KITTI depth completion (resnet18 trunk, 228x912 crops, valid-pixel sampling).
set -e
python -m cspn_tpu train --preset kitti_train "$@"
