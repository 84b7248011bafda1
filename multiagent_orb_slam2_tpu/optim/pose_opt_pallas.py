"""Fused Pallas pose-only optimizer.

Why: pose_optimize runs 4 rounds x 10 LM iterations with two
normal-equation builds per iteration — ~2800 small XLA op executions per
call at ~20 us fixed overhead each (~50 ms/call at F=2048 on the TPU
runtime here), called 2-3x per tracked frame. The whole observation set is
~100 KB, so the ENTIRE schedule fits in one kernel with everything
VMEM-resident: residual/Jacobian passes are vector ops over [S, L] blocks,
the 6x6 normal system is solved by an unrolled scalar Cholesky, and the
SE3 update (exp + compose + normalize) runs on scalars.

Semantics identical to optim.pose_opt.pose_optimize (reference
Optimizer::PoseOptimization, src/Optimizer.cc:241-453); cross-checked by
tests/test_pose_opt.py tolerances on CPU vs the XLA path and by the
tracking integration tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import OptimizerConfig
from ..geometry.camera import Intrinsics

S = 8  # sublane rows; observation n lives at (n // L, n % L)


def _chol_solve6(H, b):
    """Unrolled scalar Cholesky solve for the damped 6x6 normal system.
    H: 6x6 nested list of scalars (symmetric), b: list of 6 scalars."""
    L = [[None] * 6 for _ in range(6)]
    for j in range(6):
        d = H[j][j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        Ljj = jnp.sqrt(jnp.maximum(d, 1e-12))
        L[j][j] = Ljj
        inv = 1.0 / Ljj
        for i in range(j + 1, 6):
            s = H[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    # forward: L y = b
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # backward: L^T x = y
    x = [None] * 6
    for i in range(5, -1, -1):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _se3_update(dx, qw, qx, qy, qz, tx, ty, tz):
    """Scalar se3_exp(dx) composed onto (q, t): T_new = exp(dx) * T.
    dx = (rho, phi); translation via the SO(3) left Jacobian V."""
    rho = dx[:3]
    phi = dx[3:]
    t2 = phi[0] * phi[0] + phi[1] * phi[1] + phi[2] * phi[2]
    th = jnp.sqrt(jnp.maximum(t2, 1e-24))
    small = t2 < 1e-8
    # quaternion of exp(phi)
    half = 0.5 * th
    sh = jnp.sin(half)
    k = jnp.where(small, 0.5 - t2 / 48.0, sh / th)
    dqw = jnp.cos(half)
    dqx, dqy, dqz = k * phi[0], k * phi[1], k * phi[2]
    # V = I + A hat(phi) + B hat(phi)^2
    A = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(th)) / t2)
    B = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (th - jnp.sin(th)) / jnp.maximum(t2 * th, 1e-24))
    px, py, pz = phi[0], phi[1], phi[2]
    # hat(phi) @ rho
    h1 = (py * rho[2] - pz * rho[1],
          pz * rho[0] - px * rho[2],
          px * rho[1] - py * rho[0])
    # hat(phi) @ h1
    h2 = (py * h1[2] - pz * h1[1],
          pz * h1[0] - px * h1[2],
          px * h1[1] - py * h1[0])
    dtx = rho[0] + A * h1[0] + B * h2[0]
    dty = rho[1] + A * h1[1] + B * h2[1]
    dtz = rho[2] + A * h1[2] + B * h2[2]
    # q_new = dq * q
    nw = dqw * qw - dqx * qx - dqy * qy - dqz * qz
    nx = dqw * qx + dqx * qw + dqy * qz - dqz * qy
    ny = dqw * qy - dqx * qz + dqy * qw + dqz * qx
    nz = dqw * qz + dqx * qy - dqy * qx + dqz * qw
    # t_new = dq * t * dq^-1 + dt  (rotate t by dq)
    uvx = dqy * tz - dqz * ty
    uvy = dqz * tx - dqx * tz
    uvz = dqx * ty - dqy * tx
    uux = dqy * uvz - dqz * uvy
    uuy = dqz * uvx - dqx * uvz
    uuz = dqx * uvy - dqy * uvx
    ntx = tx + 2.0 * (dqw * uvx + uux) + dtx
    nty = ty + 2.0 * (dqw * uvy + uuy) + dty
    ntz = tz + 2.0 * (dqw * uvz + uuz) + dtz
    # normalize + hemisphere
    inv = 1.0 / jnp.sqrt(jnp.maximum(
        nw * nw + nx * nx + ny * ny + nz * nz, 1e-24))
    sgn = jnp.where(nw < 0, -inv, inv)
    return nw * sgn, nx * sgn, ny * sgn, nz * sgn, ntx, nty, ntz


def _pose_kernel(qt_ref, pw_ref, obs_ref, isig_ref, st_ref, mask_ref,
                 out_ref, inlier_ref, *, cam: Intrinsics, d2m: float,
                 d2s: float, rounds: int, iters: int):
    pwx, pwy, pwz = pw_ref[0], pw_ref[1], pw_ref[2]     # [S, L]
    ou, ov, our = obs_ref[0], obs_ref[1], obs_ref[2]
    isig = isig_ref[:]
    stf = st_ref[:]                                     # 1.0 stereo
    mask0 = mask_ref[:]
    fx, fy, bf = cam.fx, cam.fy, cam.bf
    d2 = d2s * stf + d2m * (1.0 - stf)

    def terms(qw, qx, qy, qz, tx, ty, tz, active, use_huber):
        """One residual/Jacobian pass -> (H, b, cost, chi2, zok)."""
        cx1 = 2.0 * (qy * pwz - qz * pwy)
        cy1 = 2.0 * (qz * pwx - qx * pwz)
        cz1 = 2.0 * (qx * pwy - qy * pwx)
        X = pwx + qw * cx1 + (qy * cz1 - qz * cy1) + tx
        Y = pwy + qw * cy1 + (qz * cx1 - qx * cz1) + ty
        Z = pwz + qw * cz1 + (qx * cy1 - qy * cx1) + tz
        zok = (Z > 0.01).astype(jnp.float32)
        z = jnp.maximum(Z, 1e-6)
        iz = 1.0 / z
        iz2 = iz * iz
        u = fx * X * iz + cam.cx
        v = fy * Y * iz + cam.cy
        r0 = ou - u
        r1 = ov - v
        r2 = (our - (u - bf * iz)) * stf
        chi2 = (r0 * r0 + r1 * r1 + r2 * r2) * isig
        w_rob = jnp.where(use_huber, jnp.minimum(
            1.0, jnp.sqrt(d2 / jnp.maximum(chi2, 1e-12))), 1.0)
        w = isig * w_rob * active * zok
        rho = jnp.where(
            use_huber & (chi2 > d2),
            2.0 * jnp.sqrt(d2) * jnp.sqrt(jnp.maximum(chi2, 1e-12)) - d2,
            chi2)
        cost = jnp.sum(rho * active * zok)

        # Jacobian rows (r = obs - proj => J = -dproj); J = A @ [I | -hat]
        zero = jnp.zeros_like(z)
        a = ((-fx * iz, zero, fx * X * iz2),
             (zero, -fy * iz, fy * Y * iz2),
             ((-fx * iz) * stf, zero, (fx * X * iz2 - bf * iz2) * stf))
        J = []
        for (a0, a1, a2) in a:
            b0 = a2 * Y - a1 * Z
            b1 = a0 * Z - a2 * X
            b2 = a1 * X - a0 * Y
            J.append((a0, a1, a2, b0, b1, b2))
        H = [[None] * 6 for _ in range(6)]
        bvec = [None] * 6
        rr = (r0, r1, r2)
        for j in range(6):
            for k_ in range(j, 6):
                s = (J[0][j] * J[0][k_] + J[1][j] * J[1][k_]
                     + J[2][j] * J[2][k_]) * w
                H[j][k_] = jnp.sum(s)
                H[k_][j] = H[j][k_]
            bvec[j] = -jnp.sum(
                (J[0][j] * rr[0] + J[1][j] * rr[1] + J[2][j] * rr[2]) * w)
        return H, bvec, cost, chi2, zok

    def cost_only(qw, qx, qy, qz, tx, ty, tz, active, use_huber):
        cx1 = 2.0 * (qy * pwz - qz * pwy)
        cy1 = 2.0 * (qz * pwx - qx * pwz)
        cz1 = 2.0 * (qx * pwy - qy * pwx)
        X = pwx + qw * cx1 + (qy * cz1 - qz * cy1) + tx
        Y = pwy + qw * cy1 + (qz * cx1 - qx * cz1) + ty
        Z = pwz + qw * cz1 + (qx * cy1 - qy * cx1) + tz
        zok = (Z > 0.01).astype(jnp.float32)
        z = jnp.maximum(Z, 1e-6)
        iz = 1.0 / z
        u = fx * X * iz + cam.cx
        v = fy * Y * iz + cam.cy
        r0 = ou - u
        r1 = ov - v
        r2 = (our - (u - bf * iz)) * stf
        chi2 = (r0 * r0 + r1 * r1 + r2 * r2) * isig
        rho = jnp.where(
            use_huber & (chi2 > d2),
            2.0 * jnp.sqrt(d2) * jnp.sqrt(jnp.maximum(chi2, 1e-12)) - d2,
            chi2)
        return jnp.sum(rho * active * zok), chi2, zok

    state0 = (qt_ref[0, 0], qt_ref[0, 1], qt_ref[0, 2], qt_ref[0, 3],
              qt_ref[0, 4], qt_ref[0, 5], qt_ref[0, 6], mask0)

    def round_body(rnd, st):
        qw, qx, qy, qz, tx, ty, tz, inlier = st
        use_huber = rnd < rounds - 1

        def lm_body(_, c):
            qw, qx, qy, qz, tx, ty, tz, lam = c
            H, bvec, cost0, _, _ = terms(qw, qx, qy, qz, tx, ty, tz,
                                         inlier, use_huber)
            # reference damping: H + lam * diag(H) (+ tiny floor)
            Hd = [[H[j][k_] * (1.0 + lam) + 1e-9 if j == k_ else H[j][k_]
                   for k_ in range(6)] for j in range(6)]
            dx = _chol_solve6(Hd, bvec)
            nqw, nqx, nqy, nqz, ntx, nty, ntz = _se3_update(
                dx, qw, qx, qy, qz, tx, ty, tz)
            cost1, _, _ = cost_only(nqw, nqx, nqy, nqz, ntx, nty, ntz,
                                    inlier, use_huber)
            acc = cost1 < cost0
            qw = jnp.where(acc, nqw, qw)
            qx = jnp.where(acc, nqx, qx)
            qy = jnp.where(acc, nqy, qy)
            qz = jnp.where(acc, nqz, qz)
            tx = jnp.where(acc, ntx, tx)
            ty = jnp.where(acc, nty, ty)
            tz = jnp.where(acc, ntz, tz)
            lam = jnp.clip(jnp.where(acc, lam * 0.5, lam * 4.0), 1e-8, 1e6)
            return qw, qx, qy, qz, tx, ty, tz, lam

        qw, qx, qy, qz, tx, ty, tz, _ = jax.lax.fori_loop(
            0, iters, lm_body,
            (qw, qx, qy, qz, tx, ty, tz, jnp.float32(1e-3)))
        # relabel by chi2 at the current pose
        _, chi2, zok = cost_only(qw, qx, qy, qz, tx, ty, tz, mask0, False)
        inlier = mask0 * (chi2 <= d2).astype(jnp.float32) * zok
        return (qw, qx, qy, qz, tx, ty, tz, inlier)

    qw, qx, qy, qz, tx, ty, tz, inlier = jax.lax.fori_loop(
        0, rounds, round_body, state0)
    n_in = jnp.sum(inlier)
    out_ref[0, 0] = qw
    out_ref[0, 1] = qx
    out_ref[0, 2] = qy
    out_ref[0, 3] = qz
    out_ref[0, 4] = tx
    out_ref[0, 5] = ty
    out_ref[0, 6] = tz
    out_ref[0, 7] = n_in
    inlier_ref[:] = inlier


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def pose_optimize_pallas(q0, t0, obs, cam: Intrinsics,
                         cfg: OptimizerConfig = OptimizerConfig()):
    """Drop-in pose_optimize with the whole LM schedule in one kernel."""
    N0 = obs.pw.shape[0]
    if N0 % (S * 128):
        pad = S * 128 - N0 % (S * 128)
        obs = type(obs)(
            pw=jnp.pad(obs.pw, ((0, pad), (0, 0))),
            obs=jnp.pad(obs.obs, ((0, pad), (0, 0))),
            inv_sigma2=jnp.pad(obs.inv_sigma2, (0, pad)),
            is_stereo=jnp.pad(obs.is_stereo, (0, pad)),
            mask=jnp.pad(obs.mask, (0, pad)))
    N = obs.pw.shape[0]
    L = N // S
    pw3 = obs.pw.T.reshape(3, S, L)
    ob3 = obs.obs.T.reshape(3, S, L)
    isig = obs.inv_sigma2.reshape(S, L)
    stf = obs.is_stereo.astype(jnp.float32).reshape(S, L)
    mask = obs.mask.astype(jnp.float32).reshape(S, L)
    qt = jnp.concatenate([q0, t0, jnp.zeros(1, q0.dtype)])[None, :]

    kern = functools.partial(_pose_kernel, cam=cam, d2m=cfg.chi2_mono,
                             d2s=cfg.chi2_stereo, rounds=cfg.pose_opt_rounds,
                             iters=cfg.pose_opt_iters)
    out, inl = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, 8), jnp.float32),
                   jax.ShapeDtypeStruct((S, L), jnp.float32)],
    )(qt.astype(jnp.float32), pw3, ob3, isig, stf, mask)
    q = out[0, :4]
    t = out[0, 4:7]
    inlier = (inl.reshape(N) > 0.5)[:N0] & obs.mask[:N0]
    return q, t, inlier, out[0, 7].astype(jnp.int32)
