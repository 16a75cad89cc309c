#!/usr/bin/env bash
# Training entry points (reference scripts/script_train.sh).
set -e

# OT / independent-coupling flow matching
python main.py --opts dataset ${dataset:-afhq_cat} train True eval False \
    compute_metrics False batch_size_train 128 num_epoch 600 lr 0.0001 \
    model ${model:-indep}

# Gradient-step denoiser
# python main.py --opts dataset ${dataset:-afhq_cat} train True eval False \
#     compute_metrics False model gradient_step batch_size_train 16 \
#     num_epoch 200 lr 0.0001
