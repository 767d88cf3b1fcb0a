"""Vectorized DeepSORT tracker core: batched Kalman filtering, masked gated
matching cascade, track lifecycle as fixed-shape integer state arrays, and a
ring-buffer appearance gallery -- all carried as a pytree through jit/scan."""
