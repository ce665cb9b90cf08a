#!/usr/bin/env bash
# Launch scripts for both datasets — reference script.sh equivalent.
set -e
mkdir -p logs
nohup python train.py --dataset nuscenes --camnames fl_f_fr_bl_b_br \
    --epochs_num 100 --save_dir logs/nuscenes_6cam \
    > logs/nuscenes_6cam.out 2>&1 &
nohup python train.py --dataset kitti360 --camnames 00 \
    --epochs_num 40 --save_dir logs/kitti360_00 \
    > logs/kitti360_00.out 2>&1 &
