#!/usr/bin/env bash
# Fetch the ImageNet-pretrained VGG-16 caffemodel used as training init
# (reference: /root/reference/scripts/download_imgnet_model.sh).
# The converter (smallhardface_tpu/io/caffemodel.py) reads it directly —
# both the modern `layer` and the legacy `layers` protobuf formats work.
set -euo pipefail

DEST="${1:-${DATA_DIR:-/mnt/WIDER_FACE}/imagenet_models}"
URL="http://www.robots.ox.ac.uk/~vgg/software/very_deep/caffe/VGG_ILSVRC_16_layers.caffemodel"

mkdir -p "${DEST}"
echo "Downloading VGG-16 ImageNet weights to ${DEST}/VGG16.caffemodel"
curl -L --fail -o "${DEST}/VGG16.caffemodel" "${URL}"
echo "done"
