"""Regenerate the stock cfg/name assets in this directory from the built-in
architecture builders (reference: config/*.cfg + coco.names).

Run: python config/generate.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolo_deepsort_tpu.cfg import emit_cfg, yolov3, yolov3_tiny, yolov4
from yolo_deepsort_tpu.cfg.coco_names import COCO_NAMES


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    emit_cfg(yolov3(), os.path.join(here, "yolov3.cfg"))
    emit_cfg(yolov3_tiny(), os.path.join(here, "yolov3-tiny.cfg"))
    emit_cfg(yolov4(), os.path.join(here, "yolov4.cfg"))
    with open(os.path.join(here, "coco.names"), "w", encoding="utf-8") as f:
        f.write("\n".join(COCO_NAMES) + "\n")
    print("wrote yolov3.cfg yolov3-tiny.cfg yolov4.cfg coco.names")


if __name__ == "__main__":
    main()
