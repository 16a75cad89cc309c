#!/usr/bin/env bash
# Dataset / checkpoint acquisition (reference download.sh).  This
# environment has no egress; on a connected machine, fetch:
#
#   data/celeba/        img_align_celeba + list_eval_partition.csv (Kaggle)
#   data/celebahq/test  CelebA-HQ 256 test split
#   data/afhq_cat/      AFHQ cats (train/val/test, dir-per-split)
#   data/mnist/         idx .gz files (train + t10k)
#
#   model/celeba/ot/model_final.pt        published OT-FM CelebA U-Net
#   model/afhq_cat/ot/model_final.pt      published OT-FM AFHQ U-Net
#   model/celebahq/rectified/ckpt.pth     RectifiedFlow NCSN++ CelebA-HQ
#
# Convert torch checkpoints to native msgpack once:
#   python -m pnpflow_tpu.utils.torch_convert model/celeba/ot/model_final.pt
set -e
echo "See comments for URLs/sources; zero-egress environments must mount data."
