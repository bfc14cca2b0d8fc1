#!/bin/bash
# Interactive viewer on a trained stage-1 workspace (reference: scripts/gui.sh).
# The reference opens a dearpygui window; here --gui serves the browser viewer
# (sanerf_hq_tpu/render/web_viewer.py) on localhost.
set -e
SANERFHQ_WORKSPACE_ROOT=${SANERFHQ_WORKSPACE_ROOT:-workspace}
SANERFHQ_DATA_PATH=${SANERFHQ_DATA_PATH:?set SANERFHQ_DATA_PATH}
SANERFHQ_SCENE=${SANERFHQ_SCENE:-scene}

python main.py ${SANERFHQ_DATA_PATH} \
  --workspace ${SANERFHQ_WORKSPACE_ROOT}/rgb_nerf/${SANERFHQ_SCENE} \
  --enable_cam_center \
  --downscale 4 \
  --data_type mip \
  --contract \
  --random_image_batch \
  --test \
  --gui \
  --H 512 \
  --W 512 "$@"
