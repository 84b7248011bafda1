"""Stage-by-stage bisect of obs_terms_e with explicit args."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import build_problem  # noqa: E402
from multiagent_orb_slam2_tpu.optim import ba as ba_mod  # noqa: E402
from multiagent_orb_slam2_tpu.optim.ba_kernels import (  # noqa: E402
    _quat_rotate_cols, _rot_cols)


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000


prob, cam = build_problem()
pre = ba_mod._prepare_e(prob)
kf_e, active, obs_uvr_t, inv_sigma2_e, stereo_e = pre
q, t, pw = prob.q, prob.t, prob.pw
K = q.shape[0]
P, M = prob.obs_kf.shape
E = P * M


def stage(upto):
    def f(kf_e, obs_uvr_t, inv_sigma2_e, stereo_e, active, q, t, pw):
        pose_t = jnp.concatenate([q.T, t.T], axis=0)
        g = jnp.take(pose_t, kf_e, axis=1)
        if upto == 1:
            return g
        qw_, qx_, qy_, qz_, tx_, ty_, tz_ = (g[0], g[1], g[2], g[3], g[4],
                                             g[5], g[6])
        pwT = pw.T
        px = jnp.repeat(pwT[0], M)
        py = jnp.repeat(pwT[1], M)
        pz = jnp.repeat(pwT[2], M)
        if upto == 2:
            return px + py + pz + qw_
        cx_, cy_, cz_ = _quat_rotate_cols(qw_, qx_, qy_, qz_, px, py, pz)
        X = cx_ + tx_
        Y = cy_ + ty_
        Z = cz_ + tz_
        if upto == 3:
            return X + Y + Z
        z = jnp.maximum(Z, 1e-6)
        iz = 1.0 / z
        u = cam.fx * X * iz + cam.cx
        v = cam.fy * Y * iz + cam.cy
        ur = u - cam.bf * iz
        r0 = obs_uvr_t[0] - u
        r1 = obs_uvr_t[1] - v
        r2 = jnp.where(stereo_e, obs_uvr_t[2] - ur, 0.0)
        if upto == 4:
            return r0 + r1 + r2
        chi2 = (r0 * r0 + r1 * r1 + r2 * r2) * inv_sigma2_e
        delta2 = jnp.where(stereo_e, 7.815, 5.991)
        activef = active * (Z > 0.01)
        w_rob = jnp.minimum(1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))
        delta = jnp.sqrt(delta2)
        rho = jnp.where(chi2 <= delta2, chi2,
                        2.0 * delta * jnp.sqrt(jnp.maximum(chi2, 1e-12))
                        - delta2)
        w = inv_sigma2_e * w_rob * activef
        cost = jnp.sum(rho * activef)
        if upto == 5:
            return cost
        return cost + jnp.sum(w)

    return jax.jit(f)


for i in range(1, 6):
    f = stage(i)
    print(f"stage {i}: {timeit(f, kf_e, obs_uvr_t, inv_sigma2_e, stereo_e, active, q, t, pw):.3f} ms", flush=True)
