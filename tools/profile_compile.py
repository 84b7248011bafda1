"""Isolate the banded-assembly compile-time blowup (round 3).

Round 2 full-scan path: ~38 s compile. Round 3 banded path (with lax.cond
fallback): >300 s. Measure each variant's compile + steady-state time.
"""
import sys
import time

sys.path.insert(0, ".")
import jax  # noqa: E402

from bench import build_problem  # noqa: E402
from multiagent_orb_slam2_tpu.optim.ba import ba_solve_fast  # noqa: E402

prob, cam = build_problem()
which = sys.argv[1] if len(sys.argv) > 1 else "banded"
band = {"full": None, "banded": 64, "banded32": 32, "banded128": 128}[which]

t0 = time.perf_counter()
res = ba_solve_fast(prob, cam, n_iters=10, chunk=4096, band=band)
jax.block_until_ready(res)
print(f"{which}: first call {time.perf_counter() - t0:.1f}s", flush=True)
for _ in range(3):
    t0 = time.perf_counter()
    res = ba_solve_fast(prob, cam, n_iters=10, chunk=4096, band=band)
    jax.block_until_ready(res)
    print(f"{which}: steady {1000 * (time.perf_counter() - t0):.1f} ms",
          flush=True)
