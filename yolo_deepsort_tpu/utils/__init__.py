"""Utilities: detection mAP machinery, CLEAR-MOT evaluation, profiling."""
