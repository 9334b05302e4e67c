"""Device compute kernels for the SLAM frontend and geometry.

All ops are fixed-shape, masked, jit/vmap-safe, XLA-fused pure JAX.
"""
