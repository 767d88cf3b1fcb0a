"""Executable specification of the reference pipeline (GlassyWing/yolo_deepsort).

Pure-numpy oracle implementations of the math contracts in SURVEY.md appendices
A-G. These are simultaneously (a) the authoritative behavioral spec the JAX/TPU
kernels in `yolo_deepsort_tpu/` must reproduce, and (b) the golden oracles the
test suite compares against.

Nothing in here is copied from the reference repo (which was an empty mount at
survey time); everything is written fresh from the SURVEY.md contracts:

- kalman_np      -- SURVEY.md Appendix A  (deep_sort/sort/kalman_filter.py)
- assignment_np  -- SURVEY.md Appendix B  (deep_sort/sort/linear_assignment.py)
- decode_np      -- SURVEY.md Appendix C  (yolo3/models.py YOLOLayer)
- nms_np         -- SURVEY.md Appendix D  (yolo3/utils/utils.py)
- weights_np     -- SURVEY.md Appendix E  (yolo3/models.py load_darknet_weights)
- letterbox_np   -- SURVEY.md Appendix F  (yolo3/dataset/datasets.py, utils.py)
- tracker_np     -- full DeepSORT tracker oracle (sort/{track,tracker,nn_matching,
                    iou_matching,detection}.py semantics)
- model_np       -- naive numpy darknet-layer forward, for per-layer parity tests
"""
