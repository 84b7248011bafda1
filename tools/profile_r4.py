"""Round-3 phase breakdown of the fast BA build at bench scale.

Times in-jit 10x fori loops of successively larger prefixes of
_build_and_solve_fast so each phase's marginal cost is (T_k - T_{k-1})/10:

  prep    = obs_terms_e + point blocks + Wb/Y/Hterms/bterms/Ybp stacks
  full    = prep + full-width one-hot assembly scan
  banded  = prep + banded assembly (host band data) + overflow pass
  solve   = full + PCG + back-substitution (the whole build)
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
from multiagent_orb_slam2_tpu.optim import ba_kernels as bk

prob, cam = build_problem()
K = prob.q.shape[0]
P, M = prob.obs_kf.shape
chunk = 4096
R = 64

# host band data (mirrors ba_solve_fast)
obs_kf = np.asarray(prob.obs_kf)
obs_mask = np.asarray(prob.obs_mask) & (obs_kf >= 0)
kf_min = np.where(obs_mask, obs_kf, K + 1).min(axis=1)
perm = np.argsort(kf_min, kind="stable").astype(np.int32)
n_chunks = P // chunk
cp = chunk
kf_min_s = np.clip(kf_min[perm], 0, K)
kf_max_s = np.where(obs_mask, obs_kf, -1).max(axis=1)[perm]
has_act = obs_mask.any(axis=1)[perm]
base_c = np.clip(kf_min_s.reshape(n_chunks, cp).min(axis=1),
                 0, max(K - R, 0)).astype(np.int32)
in_band = (kf_max_s < np.repeat(base_c, cp) + R) | ~has_act
ov = np.nonzero(~in_band)[0]
OC = 64
while OC < len(ov):
    OC *= 2
print(f"n_ov={len(ov)} OC={OC}")
ov_idx = np.full(OC, P, np.int32)
ov_idx[:len(ov)] = ov
probp = prob._replace(
    pw=prob.pw[perm], point_valid=prob.point_valid[perm],
    obs_kf=prob.obs_kf[perm], obs_uvr=prob.obs_uvr[perm],
    obs_inv_sigma2=prob.obs_inv_sigma2[perm],
    obs_stereo=prob.obs_stereo[perm], obs_mask=prob.obs_mask[perm])
band_data = (jnp.asarray(base_c), jnp.asarray(in_band.reshape(n_chunks, cp)),
             jnp.asarray(ov_idx))

pre = ba._prepare_e(probp)
N = 10


def _prep(q, t, pw, lam):
    kf_e, active, obs_uvr_t, inv_sigma2_e, stereo_e = pre
    tm = bk.obs_terms_e(kf_e, obs_uvr_t, inv_sigma2_e, stereo_e, active,
                        q, t, pw, cam, 5.991, 7.815, True)
    Jc, Jp, r, w = tm.Jc, tm.Jp, tm.r, tm.w
    JpP = Jp.reshape(3, 3, P, M)
    wP = w.reshape(P, M)
    rP = r.reshape(3, P, M)

    def hpp(a, b):
        return jnp.sum((JpP[0, a] * JpP[0, b] + JpP[1, a] * JpP[1, b]
                        + JpP[2, a] * JpP[2, b]) * wP, -1)

    H6 = (hpp(0, 0), hpp(0, 1), hpp(0, 2), hpp(1, 1), hpp(1, 2), hpp(2, 2))
    Hinv6 = bk.sym3_inv(H6, lam)
    bp = jnp.stack([
        -jnp.sum((JpP[0, b] * rP[0] + JpP[1, b] * rP[1]
                  + JpP[2, b] * rP[2]) * wP, -1) for b in range(3)])
    Wb = jnp.stack([jnp.stack([
        (Jc[0, a] * Jp[0, c] + Jc[1, a] * Jp[1, c] + Jc[2, a] * Jp[2, c]) * w
        for c in range(3)]) for a in range(6)])
    Hfull = {(0, 0): Hinv6[0], (0, 1): Hinv6[1], (0, 2): Hinv6[2],
             (1, 0): Hinv6[1], (1, 1): Hinv6[3], (1, 2): Hinv6[4],
             (2, 0): Hinv6[2], (2, 1): Hinv6[4], (2, 2): Hinv6[5]}
    HinvE = {k: jnp.repeat(v, M) for k, v in Hfull.items()}
    Y = jnp.stack([jnp.stack([
        Wb[a, 0] * HinvE[(0, c)] + Wb[a, 1] * HinvE[(1, c)]
        + Wb[a, 2] * HinvE[(2, c)] for c in range(3)]) for a in range(6)])
    Hterms = jnp.stack([
        (Jc[0, a] * Jc[0, b] + Jc[1, a] * Jc[1, b] + Jc[2, a] * Jc[2, b]) * w
        for a in range(6) for b in range(6)])
    bterms = jnp.stack([
        -(Jc[0, a] * r[0] + Jc[1, a] * r[1] + Jc[2, a] * r[2]) * w
        for a in range(6)])
    Ybp_e = jnp.stack([
        Y[a, 0] * jnp.repeat(bp[0], M) + Y[a, 1] * jnp.repeat(bp[1], M)
        + Y[a, 2] * jnp.repeat(bp[2], M) for a in range(6)])
    return Wb, Y, Hterms, bterms, Ybp_e, tm.cost


@jax.jit
def run_prep(q, t, pw):
    def body(i, carry):
        acc, lam = carry
        Wb, Y, Ht, bt, Yb, cost = _prep(q, t, pw + acc * 0, lam)
        s = (jnp.sum(Wb[0, 0, :8]) + jnp.sum(Y[0, 0, :8]) + jnp.sum(Ht[0, :8])
             + jnp.sum(bt[0, :8]) + jnp.sum(Yb[0, :8]) + cost)
        return acc + s * 1e-30, lam
    return jax.lax.fori_loop(0, N, body, (jnp.asarray(0.0),
                                          jnp.asarray(1e-4)))[0]


@functools.partial(jax.jit, static_argnames=("mode",))
def run_build(q, t, pw, mode):
    bd = band_data if mode == "banded" else None
    bnd = (R, OC) if mode == "banded" else None

    def body(i, carry):
        acc, lam = carry
        dc, dp, cost = ba._build_and_solve_fast(
            probp, pre, q, t, pw + acc * 0, cam, lam, 5.991, 7.815, True,
            chunk, 32, band=bnd, band_data=bd)
        return acc + (jnp.sum(dc[:2]) + cost) * 1e-30, lam
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
    print(f"{label}: compile {c:.1f}s, total {ms:.1f} ms, per-iter "
          f"{ms / N:.2f} ms")
    return ms / N


q, t, pw = probp.q, probp.t, probp.pw
p = clock("prep-only ", lambda: run_prep(q, t, pw))
f = clock("full build", lambda: run_build(q, t, pw, "full"))
b = clock("band build", lambda: run_build(q, t, pw, "banded"))
print(f"=> assembly+solve marginal: full {f - p:.2f} ms, banded {b - p:.2f} ms")
