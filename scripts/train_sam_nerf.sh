#!/bin/bash
# Stage 2: SAM feature container (reference: scripts/train_sam_nerf.sh)
set -e
SANERFHQ_WORKSPACE_ROOT=${SANERFHQ_WORKSPACE_ROOT:-workspace}
SANERFHQ_DATA_PATH=${SANERFHQ_DATA_PATH:?set SANERFHQ_DATA_PATH}
SANERFHQ_SCENE=${SANERFHQ_SCENE:-scene}
SANERFHQ_INIT_CKPT=${SANERFHQ_INIT_CKPT:-${SANERFHQ_WORKSPACE_ROOT}/rgb_nerf/${SANERFHQ_SCENE}}

python main.py ${SANERFHQ_DATA_PATH} \
  --workspace ${SANERFHQ_WORKSPACE_ROOT}/sam_nerf/${SANERFHQ_SCENE} \
  --with_sam \
  --init_ckpt ${SANERFHQ_INIT_CKPT} \
  --data_type mip \
  --iters 5000 \
  --contract \
  --feature_container cache \
  --enable_cam_center \
  --sam_use_view_direction "$@"
