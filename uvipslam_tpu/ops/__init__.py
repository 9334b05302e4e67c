"""Device compute kernels for the SLAM frontend and geometry.

All ops are fixed-shape, masked, jit/vmap-safe. Pure-JAX (XLA-fused)
implementations are the portable baseline; Pallas TPU kernels live in
`uvipslam_tpu.ops.pallas` and are drop-in replacements for the hot paths.
"""
