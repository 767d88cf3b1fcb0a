"""Darknet ``.cfg`` compatibility layer: parser, emitter, and programmatic
builders for the stock YOLOv3 / YOLOv3-tiny / YOLOv4 topologies."""

from .parse import parse_model_config, parse_data_config, emit_cfg  # noqa: F401
from .architectures import yolov3, yolov3_tiny, yolov4  # noqa: F401
from .coco_names import COCO_NAMES, load_classes  # noqa: F401
