"""Pallas TPU kernels for the alignment hot loops."""
