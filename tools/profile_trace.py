"""Capture a device trace of one banded BA solve and aggregate op times.

Writes a jax profiler trace of the 10-iteration banded build loop, then
parses the chrome-trace JSON to rank XLA ops by total device time — the
ground truth the marginal-subtraction profiles kept missing.
"""
import glob
import gzip
import json
import sys
import time
from collections import defaultdict

sys.path.insert(0, ".")
import functools

import jax
import jax.numpy as jnp

from bench import build_problem
from multiagent_orb_slam2_tpu.optim import ba

prob, cam = build_problem()
K = prob.q.shape[0]
P, M = prob.obs_kf.shape
chunk = 4096
R, OC, snap = 128, 256, 64
N = 10


@jax.jit
def classify(prob):
    perm, base_c, inb, ov_idx, ovc = ba._classify_band(
        prob, chunk, R, OC, snap)
    probp = prob._replace(
        pw=prob.pw[perm], point_valid=prob.point_valid[perm],
        obs_kf=prob.obs_kf[perm], obs_uvr=prob.obs_uvr[perm],
        obs_inv_sigma2=prob.obs_inv_sigma2[perm],
        obs_stereo=prob.obs_stereo[perm], obs_mask=prob.obs_mask[perm])
    Of_all = ba._band_onehot(probp, base_c, inb, R)
    return probp, (base_c, inb, ov_idx, Of_all)


probp, bd = classify(prob)
pre = ba._prepare_e(probp)


@jax.jit
def run(q, t, pw, bd):
    def body(i, carry):
        acc, lam = carry
        dc, dp, cost = ba._build_and_solve_fast(
            probp, pre, q, t, pw + acc * 0, cam, lam, 5.991, 7.815,
            True, chunk, 32, band=(R, OC, snap), band_data=bd)
        return acc + (jnp.sum(dc[:2]) + cost) * 1e-30, lam
    return jax.lax.fori_loop(0, N, body, (jnp.asarray(0.0),
                                          jnp.asarray(1e-4)))[0]


q, t, pw = probp.q, probp.t, probp.pw
jax.block_until_ready(run(q, t, pw, bd))          # compile
t0 = time.perf_counter()
jax.block_until_ready(run(q, t, pw, bd))
print(f"steady: {(time.perf_counter() - t0) * 1e3:.1f} ms", flush=True)

with jax.profiler.trace("/tmp/jaxtrace"):
    jax.block_until_ready(run(q, t, pw, bd))

# aggregate chrome trace events by op name
files = sorted(glob.glob("/tmp/jaxtrace/**/*.trace.json.gz", recursive=True))
print("trace files:", files, flush=True)
agg = defaultdict(float)
cnt = defaultdict(int)
with gzip.open(files[-1], "rt") as f:
    tr = json.load(f)
for ev in tr.get("traceEvents", []):
    if ev.get("ph") == "X" and "dur" in ev:
        # keep only device-lane events (TensorFlow Op names)
        name = ev.get("name", "")
        pid_name = ev.get("pid")
        agg[name] += ev["dur"]
        cnt[name] += 1
rows = sorted(agg.items(), key=lambda kv: -kv[1])
for name, us in rows[:45]:
    print(f"{us/1000:9.2f} ms  x{cnt[name]:5d}  {name[:110]}")
with open("/tmp/trace_rows.txt", "w") as f:
    for name, us in rows:
        f.write(f"{us/1000:9.3f} ms  x{cnt[name]:5d}  {name}\n")
print("full dump: /tmp/trace_rows.txt")
