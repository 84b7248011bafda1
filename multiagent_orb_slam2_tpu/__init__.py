"""TPU-native multi-agent visual SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``andresenwc/MultiAgent_ORB_SLAM2`` (ORB-SLAM2 + centralized multi-agent map
fusion).  The reference is thread-per-subsystem C++ over pointer graphs; this
engine is built TPU-first instead:

- map state is struct-of-arrays with fixed capacities + validity masks
  (``mapstate.MapState``), so every map mutation is a pure jitted function;
- the feature front end (pyramid / FAST / rBRIEF / stereo matching) is batched
  array code with Pallas kernels on the hot paths (``ops``);
- every ORB-matcher entry point reduces to masked candidate generation +
  batched packed-Hamming argmin (``ops.hamming``, ``ops.matchers``);
- nonlinear optimization (pose-only, local BA, global BA, Sim3 pose graph) is
  a JAX Levenberg-Marquardt core with Schur-complement point marginalization
  (``optim``);
- multi-agent execution maps agents onto a leading batch axis and shards the
  keyframe/point axes over a ``jax.sharding.Mesh`` (``parallel``).

See SURVEY.md at the repo root for the full map from reference components to
these modules.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# TPU MXU matmuls default to bfloat16 inputs; an 8-bit mantissa on world
# coordinates (|x| up to tens of meters, structure at millimeters) silently
# corrupts the whole geometry pipeline — measured on the 120-frame lifecycle
# corridor: ATE 2.42 m at default precision vs 0.29 m at float32 (round 5
# triage; the same mechanism inflated the round-4 at-scale run to 3.6 m).
# Pallas kernels manage their own precision and are unaffected; hot integer
# paths (Hamming) don't care. SLAM_MATMUL_PRECISION overrides for perf A/B.
_jax.config.update("jax_default_matmul_precision",
                   _os.environ.get("SLAM_MATMUL_PRECISION", "highest"))
