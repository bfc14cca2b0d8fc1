#!/usr/bin/env bash
# Full 3-stage pipeline on the rich procedural benchmark scene, driven
# through the REAL CLI from disk files — the parity proof that the whole
# reference workflow (scripts/train_rgb_nerf.sh -> train_sam_nerf.sh ->
# decode.sh -> train_obj_nerf.sh -> test_obj_nerf.sh) runs end-to-end.
#
# Env knobs:
#   SCENE  scene root (default /tmp/rich_llff; generated if absent)
#   WS     workspace root (default /tmp/rich_ws)
#   FIELD  mlp | hashgrid_packed | hashgrid (default mlp)
#   KIND   rich | clutter (default rich; clutter = the harder 7-object
#          high-frequency scene whose extrapolated views are held out
#          via the reference-format stems list in test_views.json)
#   ITERS  stage-1 iterations (default 5000, the reference envelope)
#   SAM_SIZE  vit_b | vit_l | vit_h (default vit_b: no SAM checkpoint
#             ships in this image, so the encoder runs with random
#             weights — the decode stage is exercised for pipeline
#             correctness, not mask quality; stage-3 trains on the GT
#             decode-layout masks the scene generator wrote)
set -e
cd "$(dirname "$0")/.."

KIND=${KIND:-rich}
SCENE=${SCENE:-/tmp/${KIND}_llff}
WS=${WS:-/tmp/${KIND}_ws}
FIELD=${FIELD:-mlp}
ITERS=${ITERS:-5000}
SAM_SIZE=${SAM_SIZE:-vit_b}
COMMON="--data_type llff --contract --bound 128 --min_near 0.05"
if [ "$KIND" = clutter ]; then
  # hold out the extrapolated views (reference val_split stems semantics)
  COMMON="$COMMON --val_type val_split --test_view_path $SCENE/test_views.json"
fi

[ -f "$SCENE/transforms.json" ] || python scripts/make_synth_scene.py "$SCENE" --format llff --scene "$KIND"

echo "=== stage 1: RGB NeRF ($FIELD, $ITERS iters) ==="
python main.py "$SCENE" $COMMON --workspace "$WS/rgb_$FIELD" \
  --field_type "$FIELD" --iters "$ITERS" --num_rays 4096 \
  --random_image_batch --eval_cnt 1 --save_cnt 1

echo "=== stage 2: SAM feature cache ==="
python main.py "$SCENE" $COMMON --workspace "$WS/sam_$FIELD" \
  --field_type "$FIELD" --with_sam --feature_container cache \
  --sam_model_type "$SAM_SIZE" --init_ckpt "$WS/rgb_$FIELD" --iters 0

if [ -n "$DISTILL_ITERS" ]; then
  echo "=== stage 2b: SAM feature distillation ($DISTILL_ITERS iters) ==="
  # reference distill branch (nerf/trainer.py:507-555) + rendered-feature
  # MSE eval (:648-691); cache mode above is the default container
  python main.py "$SCENE" $COMMON --workspace "$WS/distill_$FIELD" \
    --field_type "$FIELD" --with_sam --feature_container distill \
    --sam_model_type "$SAM_SIZE" --init_ckpt "$WS/rgb_$FIELD" \
    --iters "$DISTILL_ITERS" --num_rays 4096 ${DISTILL_FLAGS:-}
fi

echo "=== decode: point prompts -> per-view masks ==="
python main.py "$SCENE" $COMMON --workspace "$WS/sam_$FIELD" \
  --field_type "$FIELD" --test --decode --use_point \
  --point_file "$SCENE/example_points.json" --with_sam \
  --feature_container cache --sam_model_type "$SAM_SIZE" \
  --init_ckpt "$WS/rgb_$FIELD"

echo "=== stage 3: object field (GT decode-layout masks) ==="
python main.py "$SCENE" $COMMON --workspace "$WS/obj_$FIELD" \
  --field_type "$FIELD" --with_mask --mask_root "$SCENE/masks" \
  --n_inst 2 --init_ckpt "$WS/rgb_$FIELD" --iters 200 --num_rays 6000 \
  --ray_pair_rgb_loss_weight 1 --ray_pair_rgb_threshold 0.1 \
  --ray_pair_rgb_iter 150 --ray_pair_rgb_num_sample 8 \
  --local_sample_patch_size 8 --num_local_sample 4 --mixed_sampling \
  --error_map --eval_cnt 1 --save_cnt 1

echo "=== stage 3 eval: mIoU ==="
python main.py "$SCENE" $COMMON --workspace "$WS/obj_$FIELD" \
  --field_type "$FIELD" --test --with_mask --mask_root "$SCENE/masks" \
  --n_inst 2
