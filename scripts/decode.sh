#!/bin/bash
# Decode: 3-D point prompts -> per-view masks (reference: scripts/decode.sh)
set -e
SANERFHQ_WORKSPACE_ROOT=${SANERFHQ_WORKSPACE_ROOT:-workspace}
SANERFHQ_DATA_PATH=${SANERFHQ_DATA_PATH:?set SANERFHQ_DATA_PATH}
SANERFHQ_SCENE=${SANERFHQ_SCENE:-scene}
SANERFHQ_INIT_CKPT=${SANERFHQ_INIT_CKPT:-${SANERFHQ_WORKSPACE_ROOT}/rgb_nerf/${SANERFHQ_SCENE}}

python main.py ${SANERFHQ_DATA_PATH} \
  --workspace ${SANERFHQ_WORKSPACE_ROOT}/sam_nerf/${SANERFHQ_SCENE} \
  --init_ckpt ${SANERFHQ_INIT_CKPT} \
  --enable_cam_center \
  --data_type mip \
  --test \
  --test_split val \
  --val_type val_all \
  --with_sam \
  --num_rays 8192 \
  --contract \
  --sam_use_view_direction \
  --feature_container cache \
  --decode \
  --use_point \
  --point_file example_points.json "$@"
