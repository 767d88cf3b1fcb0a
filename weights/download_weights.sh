#!/bin/bash
# Fetch the stock pretrained weights (reference: weights/download_weights.sh).
# The darknet .weights files load directly via Darknet.load_darknet_weights;
# the DeepSORT ReID checkpoint (ckpt.t7, torch pickle) loads via
# DeepSort(model_path=...) / models/reid.py load_reid_checkpoint.
set -e
cd "$(dirname "$0")"

wget -c "https://pjreddie.com/media/files/yolov3.weights"
wget -c "https://pjreddie.com/media/files/yolov3-tiny.weights"
wget -c "https://pjreddie.com/media/files/darknet53.conv.74"
wget -c "https://github.com/AlexeyAB/darknet/releases/download/darknet_yolo_v3_optimal/yolov4.weights"

echo "ReID checkpoint ckpt.t7: download from the DeepSORT-pytorch release"
echo "(Google Drive link in the upstream README) and place it here."
