"""Dataset IO, synthetic scene generation, trajectory writers.

Covers the reference's L7 data path (Examples/*/LoadImages, trajectory
writers src/System.cc:390-540) plus a synthetic renderer the reference lacks:
with no dataset blobs in CI, correctness is established on ray-cast synthetic
scenes with exact ground-truth poses and depth.
"""
