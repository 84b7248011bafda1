"""Numerical check: ba_pallas.prep_terms vs the XLA E-major formulation."""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from bench import build_problem
from multiagent_orb_slam2_tpu.optim import ba, ba_pallas
from multiagent_orb_slam2_tpu.optim import ba_kernels as bk

prob, cam = build_problem(K=256, P=16384, M=8, seed=0)
K = prob.q.shape[0]
P, M = prob.obs_kf.shape
lam = 1e-4

# ---- m-major inputs -------------------------------------------------------
active = prob.obs_mask & (prob.obs_kf >= 0) & prob.point_valid[:, None]
kf_m = jnp.where(active, jnp.clip(prob.obs_kf, 0, K - 1), K).T  # [M, P]
kf_g = jnp.minimum(kf_m, K - 1)
uvr_m = prob.obs_uvr.transpose(2, 1, 0)
isig_m = prob.obs_inv_sigma2.T
stereo_m = prob.obs_stereo.T.astype(jnp.float32)
active_m = active.T.astype(jnp.float32)

pose_t = jnp.concatenate([prob.q.T, prob.t.T], 0)
g = jnp.take(pose_t, kf_g.reshape(-1), axis=1).reshape(7, M, P)

t0 = time.perf_counter()
Wb, Y, Ht, bt, Ybp, hinv6, bp, cost, _chi2 = ba_pallas.prep_terms(
    lam, g, uvr_m, isig_m, stereo_m, active_m, prob.pw.T,
    cam, 5.991, 7.815, True, pb=1024)
jax.block_until_ready(Wb)
print(f"kernel compile+run: {time.perf_counter() - t0:.1f}s", flush=True)

# ---- E-major reference ----------------------------------------------------
pre = ba._prepare_e(prob)
kf_e, act_e, uvr_t, isig_e, st_e = pre
tm = bk.obs_terms_e(kf_e, uvr_t, isig_e, st_e, act_e,
                    prob.q, prob.t, prob.pw, cam, 5.991, 7.815, True)
Jc, Jp, r, w = tm.Jc, tm.Jp, tm.r, tm.w
JpP = Jp.reshape(3, 3, P, M)
wP = w.reshape(P, M)
rP = r.reshape(3, P, M)


def hpp(a, b):
    return jnp.sum((JpP[0, a] * JpP[0, b] + JpP[1, a] * JpP[1, b]
                    + JpP[2, a] * JpP[2, b]) * wP, -1)


H6 = (hpp(0, 0), hpp(0, 1), hpp(0, 2), hpp(1, 1), hpp(1, 2), hpp(2, 2))
Hinv6_ref = bk.sym3_inv(H6, lam)
bp_ref = jnp.stack([
    -jnp.sum((JpP[0, b] * rP[0] + JpP[1, b] * rP[1]
              + JpP[2, b] * rP[2]) * wP, -1) for b in range(3)])

Wb_ref = jnp.stack([jnp.stack([
    (Jc[0, a] * Jp[0, c] + Jc[1, a] * Jp[1, c] + Jc[2, a] * Jp[2, c]) * w
    for c in range(3)]) for a in range(6)])          # [6, 3, E] (a, c)


def e2m(x_e):
    """[E] p-major -> [M, P]."""
    return x_e.reshape(P, M).T


def cmp(name, got_m, ref_e, tol=2e-4):
    ref = np.asarray(ref_e)
    got = np.asarray(got_m)
    scale = np.abs(ref).max() + 1e-9
    err = np.abs(got - ref).max() / scale
    print(f"{name:8s} rel-max-err {err:.2e} {'OK' if err < tol else 'FAIL'}",
          flush=True)
    return err < tol


ok = True
# Wb kernel rows are (c, a) c-major over [18, M, P]
Wb_k = np.asarray(Wb).reshape(3, 6, M, P)
for c in range(3):
    for a in range(6):
        pass
Wb_ref_m = np.stack([np.stack([np.asarray(e2m(Wb_ref[a, c]))
                               for a in range(6)]) for c in range(3)])
ok &= cmp("Wb", Wb_k, Wb_ref_m)

Hfull = {(0, 0): Hinv6_ref[0], (0, 1): Hinv6_ref[1], (0, 2): Hinv6_ref[2],
         (1, 0): Hinv6_ref[1], (1, 1): Hinv6_ref[3], (1, 2): Hinv6_ref[4],
         (2, 0): Hinv6_ref[2], (2, 1): Hinv6_ref[4], (2, 2): Hinv6_ref[5]}
HinvE = {k: jnp.repeat(v, M) for k, v in Hfull.items()}
Y_ref = jnp.stack([jnp.stack([
    Wb_ref[a, 0] * HinvE[(0, c)] + Wb_ref[a, 1] * HinvE[(1, c)]
    + Wb_ref[a, 2] * HinvE[(2, c)] for c in range(3)]) for a in range(6)])
Y_k = np.asarray(Y).reshape(3, 6, M, P)
Y_ref_m = np.stack([np.stack([np.asarray(e2m(Y_ref[a, c]))
                              for a in range(6)]) for c in range(3)])
ok &= cmp("Y", Y_k, Y_ref_m, tol=1e-3)

Ht_ref = jnp.stack([
    (Jc[0, a] * Jc[0, b] + Jc[1, a] * Jc[1, b] + Jc[2, a] * Jc[2, b]) * w
    for a in range(6) for b in range(6)])
Ht_ref_m = np.stack([np.asarray(e2m(Ht_ref[i])) for i in range(36)])
ok &= cmp("Ht", np.asarray(Ht), Ht_ref_m)

bt_ref = jnp.stack([
    -(Jc[0, a] * r[0] + Jc[1, a] * r[1] + Jc[2, a] * r[2]) * w
    for a in range(6)])
bt_ref_m = np.stack([np.asarray(e2m(bt_ref[i])) for i in range(6)])
ok &= cmp("bt", np.asarray(bt), bt_ref_m)

Ybp_ref = jnp.stack([
    Y_ref[a, 0] * jnp.repeat(bp_ref[0], M) + Y_ref[a, 1] * jnp.repeat(
        bp_ref[1], M) + Y_ref[a, 2] * jnp.repeat(bp_ref[2], M)
    for a in range(6)])
Ybp_ref_m = np.stack([np.asarray(e2m(Ybp_ref[i])) for i in range(6)])
ok &= cmp("Ybp", np.asarray(Ybp), Ybp_ref_m, tol=1e-3)

ok &= cmp("hinv6", np.asarray(hinv6), np.stack(
    [np.asarray(v) for v in Hinv6_ref]), tol=1e-3)
ok &= cmp("bp", np.asarray(bp), np.asarray(bp_ref))
ok &= cmp("cost", np.asarray(cost), np.asarray(tm.cost), tol=1e-5)

# ---- speed ---------------------------------------------------------------
import functools


@jax.jit
def loop_kernel(lam, g, pw):
    def body(i, acc):
        out = ba_pallas.prep_terms(lam + acc * 1e-30, g, uvr_m, isig_m,
                                   stereo_m, active_m, pw, cam, 5.991,
                                   7.815, True, pb=1024)
        return acc + out[7] * 1e-30
    return jax.lax.fori_loop(0, 10, body, jnp.asarray(0.0))


t0 = time.perf_counter()
jax.block_until_ready(loop_kernel(lam, g, prob.pw.T))
print(f"loop compile: {time.perf_counter() - t0:.1f}s", flush=True)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    jax.block_until_ready(loop_kernel(lam, g, prob.pw.T))
    ts.append(time.perf_counter() - t0)
print(f"kernel per-iter (P={P}): {min(ts) * 100:.2f} ms", flush=True)
print("ALL OK" if ok else "MISMATCH", flush=True)
