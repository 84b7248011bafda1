"""Multi-chip execution: device meshes, sharded bundle adjustment, batched
multi-agent steps.

The reference's "distributed backend" is N threads sharing one heap
(SURVEY.md §2g); here scaling is jax.sharding over a Mesh:

- agents axis  -> data parallelism (one SLAM front end per mesh slot)
- points axis  -> tensor-style sharding of the map for distributed BA:
  each device owns a shard of points + their observations, computes its
  Schur-complement contributions locally, and the reduced camera system is
  assembled with psum over ICI — the "fixed cameras as halo" design from
  SURVEY.md §5.
"""
from .dist_ba import distributed_ba_solve, make_mesh  # noqa: F401
