"""Pallas TPU kernels for the hot dense-linear-algebra paths."""
