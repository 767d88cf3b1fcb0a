"""Model construction: cfg-driven darknet networks (YOLOv3/v3-tiny/v4) and
the DeepSORT ReID embedding net, as pure-functional JAX apply functions over
parameter pytrees."""
