"""Pallas TPU kernels: the performance tier of the rasterizer.

Hand-scheduled per-tile compositing with dynamic per-tile loop bounds and a
hand-derived backward pass (prefix-sum formulation) — the TPU-native
replacement for renderCUDA forward/backward (forward.cu:261-402,
backward.cu:417-646)."""
