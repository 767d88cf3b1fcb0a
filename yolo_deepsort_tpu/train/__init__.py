"""Training: ReID classifier training (the reference's only training CLI,
deep_sort/deep/train.py) and YOLO loss machinery."""
