#!/usr/bin/env bash
# The published training recipe (behavioral reference: tools/train/train.sh):
# 256^2 input, batch 8 x 2 grad groups, 8 input / 24 output views, GRU fuser,
# hard-smooth-L1 depth (k=16384, milestones 15/30/45/60 via resume), BCE
# mask, no discriminator, no color head, random COCO backgrounds, mask noise
# p=0.25, data-parallel over the device mesh, bf16 compute.
set -e

SAVE_DIR=${SAVE_DIR:?set SAVE_DIR}
SHAPENET_PATH=${SHAPENET_PATH:?set SHAPENET_PATH}
TEXTURES_PATH=${TEXTURES_PATH:?set TEXTURES_PATH (COCO images)}

python "$(dirname "$0")/train_reconstruct.py" \
    --histogram-interval -1 \
    --plot-interval 500 \
    --show-interval 1000 \
    --dataset-type shapenet \
    --dataset-path "$SHAPENET_PATH" \
    --textures-path "$TEXTURES_PATH" \
    --color-background-path "$TEXTURES_PATH" \
    --color-noise-level 0.05 \
    --depth-noise-level 0.00 \
    --num-workers 5 \
    --save-dir "$SAVE_DIR" \
    --base-name "shapenet,256" \
    --input-size 256 \
    --batch-size 8 \
    --batch-groups 2 \
    --batches-per-epoch 4000 \
    --num-input-views 8 \
    --num-output-views 24 \
    --optimizer adam \
    --generator-lr 0.00075 \
    --discriminator-lr 0.00075 \
    --sculptor-image-config "64,D,128,D,196,D,256,D,512,D,512,D,512:512,U,512,U,256" \
    --sculptor-camera-config "64,128,256" \
    --sculptor-object-config "256,256" \
    --sculptor-projection-type factor \
    --photographer-object-config none \
    --photographer-camera-config "256,256" \
    --photographer-image-config "256,D,512,D,512:512,U,512,U,512,U,256,U,196,U,128,U,64" \
    --photographer-projection-type factor \
    --fuser-type gru \
    --g-depth-recon-loss-type hard_smooth_l1 \
    --g-depth-recon-loss-weight 25.0 \
    --g-depth-recon-loss-k 16384 \
    --g-depth-recon-loss-k-milestones 15,30,45,60 \
    --g-mask-recon-loss-type binary_cross_entropy \
    --g-mask-recon-loss-weight 25.0 \
    --g-mask-beta-loss-weight 0.0 \
    --random-orientation \
    --crop-predicted-mask \
    --generator-input-mask \
    --no-discriminator \
    --color-random-background \
    --crop-random-background \
    --mask-noise-p 0.25 \
    --predict-depth \
    --predict-mask \
    --scale-mode nearest \
    --use-amp \
    --data-parallel
