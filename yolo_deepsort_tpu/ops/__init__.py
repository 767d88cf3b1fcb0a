"""Fixed-shape JAX/XLA/Pallas compute kernels: box math, YOLO decode, batched
NMS, letterbox preprocessing, crop-and-embed, masked assignment solvers."""
