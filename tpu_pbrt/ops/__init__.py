"""Compute-path ops: math, sampling, BRDF, intersection, BVH, traversal."""
