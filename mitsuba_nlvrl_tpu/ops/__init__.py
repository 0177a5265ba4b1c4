"""Compute ops: intersection, BVH, hash grids, Pallas kernels."""
