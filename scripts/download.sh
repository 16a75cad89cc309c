#!/usr/bin/env bash
# Dataset / checkpoint acquisition + conversion (reference download.sh).
#
#   bash scripts/download.sh <target> [<target> ...]
#
# Targets (same artifacts the reference fetches, plus FID/LPIPS weights and
# the one-time torch->msgpack conversion this framework uses):
#   pretrained-network-celeba     published OT-FM CelebA U-Net (.pt) + convert
#   pretrained-network-afhq-cat   published OT-FM AFHQ U-Net (.pt) + convert
#   celeba-dataset                CelebA aligned crops + partition CSV (Kaggle)
#   celeba-hq-dataset             CelebA-HQ 256
#   afhq-cat-dataset              AFHQ (cats used)
#   inception-fid                 pytorch-fid Inception weights -> npz
#   mnist                         MNIST idx files
#
# Requires egress plus gdown/kaggle/wget as in the reference; zero-egress
# environments must mount the artifacts at the same paths instead.
set -euo pipefail

convert_unet() { # <pt path>
    python -m pnpflow_tpu.utils.torch_convert "$1"
}

fetch_one() {
    case "$1" in
    pretrained-network-celeba)
        mkdir -p model/celeba/ot
        gdown --id 1ZZ6S-PGRx-tOPkr4Gt3A6RN-PChabnD6 -O model/celeba/ot/model_final.pt
        convert_unet model/celeba/ot/model_final.pt
        ;;
    pretrained-network-afhq-cat)
        mkdir -p model/afhq_cat/ot
        gdown --id 1FpD3cYpgtM8-KJ3Qk48fcjtr1Ne_IMOF -O model/afhq_cat/ot/model_final.pt
        convert_unet model/afhq_cat/ot/model_final.pt
        ;;
    celeba-dataset)
        mkdir -p data/celeba
        kaggle datasets download jessicali9530/celeba-dataset -p data/celeba
        unzip -q data/celeba/celeba-dataset.zip -d data/celeba
        rm data/celeba/celeba-dataset.zip
        if [ -d data/celeba/img_align_celeba/img_align_celeba ]; then
            mv data/celeba/img_align_celeba/img_align_celeba/* data/celeba/img_align_celeba/
            rmdir data/celeba/img_align_celeba/img_align_celeba
        fi
        ;;
    celeba-hq-dataset)
        mkdir -p data/celebahq
        wget -N "https://www.dropbox.com/s/f7pvjij2xlpff59/celeba_hq.zip?dl=0" -O data/celeba_hq.zip
        unzip -q data/celeba_hq.zip -d data/celebahq
        rm data/celeba_hq.zip
        ;;
    afhq-cat-dataset)
        mkdir -p data
        wget -N "https://www.dropbox.com/s/t9l9o3vsx2jai3z/afhq.zip?dl=0" -O data/afhq.zip
        unzip -q data/afhq.zip -d data
        rm data/afhq.zip
        mv data/afhq data/afhq_cat
        bash scripts/afhq_validation_images.sh
        ;;
    inception-fid)
        mkdir -p model
        wget -N "https://github.com/mseitzer/pytorch-fid/releases/download/fid_weights/pt_inception-2015-12-05-6726825d.pth" \
            -O model/pt_inception.pth
        python -m pnpflow_tpu.utils.inception_convert model/pt_inception.pth model/inception_fid.npz
        ;;
    inception-fid-synthetic)
        # zero-egress fallback: deterministic random-init weights with the
        # published checkpoint's exact shapes; exercises the full metric
        # protocol but values are not comparable to published FID/IS
        mkdir -p model
        python -m pnpflow_tpu.utils.inception_convert --synthetic model/inception_fid.npz
        ;;
    mnist)
        mkdir -p data/mnist
        base="https://storage.googleapis.com/cvdf-datasets/mnist"
        for f in train-images-idx3-ubyte train-labels-idx1-ubyte \
                 t10k-images-idx3-ubyte t10k-labels-idx1-ubyte; do
            wget -N "$base/$f.gz" -O "data/mnist/$f.gz"
        done
        ;;
    *)
        echo "unknown target: $1" >&2
        echo "targets: pretrained-network-celeba pretrained-network-afhq-cat celeba-dataset celeba-hq-dataset afhq-cat-dataset inception-fid inception-fid-synthetic mnist" >&2
        exit 1
        ;;
    esac
}

if [ "$#" -eq 0 ]; then
    echo "usage: bash scripts/download.sh <target> [<target> ...]" >&2
    exit 1
fi
for target in "$@"; do
    fetch_one "$target"
done
