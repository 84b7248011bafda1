"""Parameter sweep of the real banded build: chunk size x overflow capacity.

If time drops with OC -> the overflow pass dominates; if it drops with
bigger chunks -> per-chunk overheads dominate; if neither -> the scan body
itself is mis-lowered.
"""
import sys
import time

sys.path.insert(0, ".")
import functools

import jax
import jax.numpy as jnp

from bench import build_problem
from multiagent_orb_slam2_tpu.optim import ba

prob, cam = build_problem()
K = prob.q.shape[0]
P, M = prob.obs_kf.shape
R, snap = 128, 64
N = 10


def classify(prob, chunk, OC):
    @jax.jit
    def go(prob):
        perm, base_c, inb, ov_idx, ovc = ba._classify_band(
            prob, chunk, R, OC, snap)
        probp = prob._replace(
            pw=prob.pw[perm], point_valid=prob.point_valid[perm],
            obs_kf=prob.obs_kf[perm], obs_uvr=prob.obs_uvr[perm],
            obs_inv_sigma2=prob.obs_inv_sigma2[perm],
            obs_stereo=prob.obs_stereo[perm], obs_mask=prob.obs_mask[perm])
        Of_all = ba._band_onehot(probp, base_c, inb, R)
        return probp, (base_c, inb, ov_idx, Of_all)
    return go(prob)


def clock(label, fn):
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    c = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3 / N
    print(f"{label}: compile {c:5.1f}s  per-iter {ms:6.2f} ms", flush=True)
    return ms


for chunk in (4096, 8192, 16384):
    for OC in (256, 4096):
        probp, bd = classify(prob, chunk, OC)
        pre = ba._prepare_e(probp)

        @functools.partial(jax.jit, static_argnames=())
        def run(q, t, pw, bd):
            def body(i, carry):
                acc, lam = carry
                dc, dp, cost = ba._build_and_solve_fast(
                    probp, pre, q, t, pw + acc * 0, cam, lam, 5.991, 7.815,
                    True, chunk, 32, band=(R, OC, snap), band_data=bd)
                return acc + (jnp.sum(dc[:2]) + cost) * 1e-30, lam
            return jax.lax.fori_loop(0, N, body, (jnp.asarray(0.0),
                                                  jnp.asarray(1e-4)))[0]

        clock(f"chunk={chunk:5d} OC={OC:4d}",
              functools.partial(run, probp.q, probp.t, probp.pw, bd))
