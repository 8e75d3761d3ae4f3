"""Compute kernels (reference L2 inner loops, TPU-first redesigns)."""
