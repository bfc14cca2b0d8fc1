#!/bin/bash
# Stage 1: RGB NeRF (reference: scripts/train_rgb_nerf.sh)
set -e
SANERFHQ_WORKSPACE_ROOT=${SANERFHQ_WORKSPACE_ROOT:-workspace}
SANERFHQ_DATA_PATH=${SANERFHQ_DATA_PATH:?set SANERFHQ_DATA_PATH}
SANERFHQ_SCENE=${SANERFHQ_SCENE:-scene}

python main.py ${SANERFHQ_DATA_PATH} \
  --workspace ${SANERFHQ_WORKSPACE_ROOT}/rgb_nerf/${SANERFHQ_SCENE} \
  --enable_cam_center \
  --downscale 4 \
  --data_type mip \
  --iters 5000 \
  --contract \
  --random_image_batch "$@"
