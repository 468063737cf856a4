"""Numerical ops: KNN scoring, SSIM, depth alignment, flow projection."""
