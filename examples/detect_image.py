"""Single-image detection (mirrors the reference README's ImageDetector
usage).

  python examples/detect_image.py IMAGE [--cfg config/yolov3.cfg]
      [--weights weights/yolov3.weights] [--out out.jpg]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolo_deepsort_tpu import Darknet, ImageDetector  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("image")
    p.add_argument("--cfg", default="yolov3")
    p.add_argument("--weights", default=None)
    p.add_argument("--img-size", type=int, default=None)
    p.add_argument("--conf-thres", type=float, default=0.5)
    p.add_argument("--nms-thres", type=float, default=0.4)
    p.add_argument("--out", default="detections.jpg")
    args = p.parse_args()

    from PIL import Image

    model = Darknet(args.cfg, img_size=args.img_size)
    if args.weights:
        model.load_darknet_weights(args.weights)
    detector = ImageDetector(model, conf_thres=args.conf_thres,
                             nms_thres=args.nms_thres)

    img = np.asarray(Image.open(args.image).convert("RGB"))
    dets = detector.detect(img)
    for x1, y1, x2, y2, obj, cls_conf, cls in dets:
        name = detector.class_names[int(cls)]
        print(f"{name:>16} {obj:.2f}  [{x1:.0f}, {y1:.0f}, {x2:.0f}, {y2:.0f}]")
    Image.fromarray(detector.draw(img, dets)).save(args.out)
    print(f"{len(dets)} detections -> {args.out}")


if __name__ == "__main__":
    main()
