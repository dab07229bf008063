#!/usr/bin/env bash
# Fetch the reference Depth Pro checkpoint and convert it for TPU use.
# (Equivalent of the reference's get_pretrained_models.sh; conversion is
# ours — torch layout -> NHWC/stacked npz.)
set -euo pipefail
mkdir -p checkpoints
[ -f checkpoints/depth_pro.pt ] || \
  wget -q -O checkpoints/depth_pro.pt \
    https://ml-site.cdn-apple.com/models/depth-pro/depth_pro.pt
python -m ml_depth_pro_video_tpu.ckpt.convert \
  checkpoints/depth_pro.pt checkpoints/depth_pro_tpu.npz
echo "wrote checkpoints/depth_pro_tpu.npz"
