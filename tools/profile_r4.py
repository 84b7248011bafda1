"""Round-4 phase breakdown of the fast BA build at bench scale (new in-jit
banded API).

Times in-jit 10x fori loops of successively larger prefixes of
_build_and_solve_fast so each phase's marginal cost is (T_k - T_{k-1})/10:

  prep      = obs_terms_e + point blocks + Wb/Y/Hterms/bterms/Ybp stacks
  full      = prep + full-width one-hot assembly scan + solve
  banded    = prep + banded assembly (f32 cross) + overflow + solve
  banded16  = same with bf16 cross product
Also times _classify_band standalone (once per solve, not per iter).
"""
import sys
import time

sys.path.insert(0, ".")
import functools

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_problem
from multiagent_orb_slam2_tpu.optim import ba

prob, cam = build_problem()
K = prob.q.shape[0]
P, M = prob.obs_kf.shape
chunk = 4096
R, OC, snap = 128, max(256, P // 16), 64
N = 10


@jax.jit
def classify(prob):
    perm, base_c, inb, ov_idx, ov_count = ba._classify_band(
        prob, chunk, R, OC, snap)
    probp = prob._replace(
        pw=prob.pw[perm], point_valid=prob.point_valid[perm],
        obs_kf=prob.obs_kf[perm], obs_uvr=prob.obs_uvr[perm],
        obs_inv_sigma2=prob.obs_inv_sigma2[perm],
        obs_stereo=prob.obs_stereo[perm], obs_mask=prob.obs_mask[perm])
    Of_all = ba._band_onehot(probp, base_c, inb, R)
    return probp, (base_c, inb, ov_idx, Of_all), ov_count


probp, band_data, ovc = classify(prob)
jax.block_until_ready(probp)
print(f"n_ov={int(ovc)} OC={OC}")
t0 = time.perf_counter()
for _ in range(3):
    out = classify(prob)
    jax.block_until_ready(out[0])
print(f"classify+permute: {(time.perf_counter() - t0) / 3 * 1e3:.1f} ms/call")

pre = ba._prepare_e(probp)


@functools.partial(jax.jit, static_argnames=("mode",))
def run_build(q, t, pw, bd, mode):
    bnd = (R, OC, snap) if mode.startswith("banded") else None
    bf16 = mode == "banded16"
    if not mode.startswith("banded"):
        bd = None

    def body(i, carry):
        acc, lam = carry
        dc, dp, cost = ba._build_and_solve_fast(
            probp, pre, q, t, pw + acc * 0, cam, lam, 5.991, 7.815, True,
            chunk, 32, band=bnd, band_data=bd, cross_bf16=bf16)
        return acc + (jnp.sum(dc[:2]) + cost) * 1e-30, lam
    return jax.lax.fori_loop(0, N, body, (jnp.asarray(0.0),
                                          jnp.asarray(1e-4)))[0]


@jax.jit
def run_prep(q, t, pw):
    kf_e, active, obs_uvr_t, inv_sigma2_e, stereo_e = pre
    from multiagent_orb_slam2_tpu.optim import ba_kernels as bk

    def body(i, carry):
        acc, lam = carry
        tm = bk.obs_terms_e(kf_e, obs_uvr_t, inv_sigma2_e, stereo_e, active,
                            q, t, pw + acc * 0, cam, 5.991, 7.815, True)
        s = jnp.sum(tm.Jc[0, 0, :8]) + jnp.sum(tm.Jp[0, 0, :8]) + tm.cost
        return acc + s * 1e-30, lam
    return jax.lax.fori_loop(0, N, body, (jnp.asarray(0.0),
                                          jnp.asarray(1e-4)))[0]


def clock(label, fn):
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    c = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3
    print(f"{label}: compile {c:5.1f}s, total {ms:6.1f} ms, per-iter "
          f"{ms / N:5.2f} ms")
    return ms / N


q, t, pw = probp.q, probp.t, probp.pw
o = clock("obs-only  ", lambda: run_prep(q, t, pw))
f = clock("full build", lambda: run_build(q, t, pw, band_data, "full"))
b = clock("band build", lambda: run_build(q, t, pw, band_data, "banded"))
b16 = clock("band bf16 ", lambda: run_build(q, t, pw, band_data, "banded16"))
print(f"=> marginals vs obs: full {f - o:.2f}, banded {b - o:.2f}, "
      f"banded16 {b16 - o:.2f} ms/iter")
