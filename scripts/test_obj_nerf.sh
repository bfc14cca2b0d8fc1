#!/bin/bash
# Stage 3 eval: mIoU on held-out views (reference: scripts/test_obj_nerf.sh)
set -e
SANERFHQ_WORKSPACE_ROOT=${SANERFHQ_WORKSPACE_ROOT:-workspace}
SANERFHQ_DATA_PATH=${SANERFHQ_DATA_PATH:?set SANERFHQ_DATA_PATH}
SANERFHQ_SCENE=${SANERFHQ_SCENE:-scene}
SANERFHQ_MASK_PATH=${SANERFHQ_MASK_PATH:-${SANERFHQ_WORKSPACE_ROOT}/sam_nerf/${SANERFHQ_SCENE}/object_masks}

python main.py ${SANERFHQ_DATA_PATH} \
  --mask_root ${SANERFHQ_MASK_PATH} \
  --test_view_path example_test_views.json \
  --workspace ${SANERFHQ_WORKSPACE_ROOT}/obj_nerf/${SANERFHQ_SCENE} \
  --enable_cam_center \
  --with_mask \
  --test \
  --test_split val \
  --val_type val_split \
  --data_type mip \
  --contract \
  --use_default_intrinsics \
  --return_extra \
  --render_mask_instance_id 1 "$@"
