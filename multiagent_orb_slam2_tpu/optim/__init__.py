"""Nonlinear least-squares on TPU: the g2o replacement.

The reference funnels all optimization through six static functions on g2o
graphs (src/Optimizer.cc, SURVEY.md §2e). Here each becomes a pure jitted
Levenberg-Marquardt program over fixed-shape arrays:

- ``pose_opt``       — PoseOptimization (4x10 robust rounds, 6-DoF)
- ``ba``             — Local/Global BundleAdjustment with explicit
                       Schur-complement point marginalization (the
                       setMarginalized(true) structure as batched 3x3 inverses)
- ``sim3_opt``       — OptimizeSim3 (7-DoF, bidirectional projections)
- ``pose_graph``     — OptimizeEssentialGraph (Sim3 pose graph)

No sparse Cholesky: point blocks are marginalized in parallel, the reduced
pose system is solved dense (Cholesky) or by preconditioned CG when sharded.
"""
