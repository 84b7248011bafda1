"""TPU-tuned BA inner kernels: E-major layout + matmul assembly + PCG.

Why this exists: the straightforward formulation in optim.ba keeps
per-observation Jacobians as [..., 3, 6] arrays. TPU tiles pad the last two
axes to (8, 128), so every such intermediate costs ~20x its logical memory
in HBM traffic. Here every per-observation quantity is laid out with the
small matrix indices LEADING and the flattened observation axis E = P*M
LAST ([3, 6, E] etc.), keeping tensors dense in the lane dimension; all
reductions onto keyframes go through one-hot matrix products on the MXU, and
the reduced camera system is solved by block-Jacobi-preconditioned CG
(a dense 1536^2 Cholesky costs ~24 ms/iteration on one v5e core — PCG
matvecs cost microseconds).

Everything here is algebraically identical to optim.ba's reference
formulation; tests cross-check the two.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.camera import Intrinsics


def _quat_rotate_cols(qw, qx, qy, qz, vx, vy, vz):
    """Componentwise quaternion rotation over [E] vectors."""
    # t = 2 * cross(qv, v)
    tx = 2.0 * (qy * vz - qz * vy)
    ty = 2.0 * (qz * vx - qx * vz)
    tz = 2.0 * (qx * vy - qy * vx)
    # v' = v + qw * t + cross(qv, t)
    ox = vx + qw * tx + (qy * tz - qz * ty)
    oy = vy + qw * ty + (qz * tx - qx * tz)
    oz = vz + qw * tz + (qx * ty - qy * tx)
    return ox, oy, oz


def _rot_cols(qw, qx, qy, qz):
    """Rotation matrix entries (9 arrays over [E]) from quaternion columns."""
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    return (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy))


class ObsTermsE(NamedTuple):
    r: jnp.ndarray       # [3, E] residuals (obs - proj), row 2 masked mono
    Jc: jnp.ndarray      # [3, 6, E] d r / d pose-twist
    Jp: jnp.ndarray      # [3, 3, E] d r / d point
    w: jnp.ndarray       # [E] IRLS weight (inv_sigma2 * huber * active)
    chi2: jnp.ndarray    # [E]
    cost: jnp.ndarray    # scalar robust cost


def obs_terms_e(obs_kf, obs_uvr_t, inv_sigma2_e, stereo_e, active_base,
                q, t, pw, cam: Intrinsics, delta2_m, delta2_s,
                use_huber: bool) -> ObsTermsE:
    """All residuals/Jacobians in E-major layout.

    obs_kf: [E] int32 (already clipped valid / masked via active_base)
    obs_uvr_t: [3, E]; inv_sigma2_e/stereo_e/active_base: [E]
    q,t: [K,4]/[K,3] pose tables; pw: [P,3]; E must equal P*M with
    observation e belonging to point e // M.
    """
    E = obs_kf.shape[0]
    P = pw.shape[0]
    M = E // P

    # one [7, E] gather (single instruction) instead of seven row gathers
    pose_t = jnp.concatenate([q.T, t.T], axis=0)          # [7, K]
    g = jnp.take(pose_t, obs_kf, axis=1)                  # [7, E]
    qw_, qx_, qy_, qz_, tx_, ty_, tz_ = (g[0], g[1], g[2], g[3], g[4], g[5],
                                         g[6])
    pwT = pw.T                       # [3, P]
    px = jnp.repeat(pwT[0], M)       # p-major E ordering
    py = jnp.repeat(pwT[1], M)
    pz = jnp.repeat(pwT[2], M)

    cx_, cy_, cz_ = _quat_rotate_cols(qw_, qx_, qy_, qz_, px, py, pz)
    X = cx_ + tx_
    Y = cy_ + ty_
    Z = cz_ + tz_
    z_ok = Z > 0.01
    z = jnp.maximum(Z, 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz

    u = cam.fx * X * iz + cam.cx
    v = cam.fy * Y * iz + cam.cy
    ur = u - cam.bf * iz
    r0 = obs_uvr_t[0] - u
    r1 = obs_uvr_t[1] - v
    r2 = jnp.where(stereo_e, obs_uvr_t[2] - ur, 0.0)
    r = jnp.stack([r0, r1, r2])

    chi2 = (r0 * r0 + r1 * r1 + r2 * r2) * inv_sigma2_e
    delta2 = jnp.where(stereo_e, delta2_s, delta2_m)
    active = active_base * z_ok
    if use_huber:
        w_rob = jnp.minimum(1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))
        delta = jnp.sqrt(delta2)
        rho = jnp.where(chi2 <= delta2, chi2,
                        2.0 * delta * jnp.sqrt(jnp.maximum(chi2, 1e-12))
                        - delta2)
    else:
        w_rob = jnp.ones_like(chi2)
        rho = chi2
    w = inv_sigma2_e * w_rob * active
    cost = jnp.sum(rho * active)

    # dproj/dpc rows (sign: r = obs - proj => J = -dproj)
    fx, fy, bf = cam.fx, cam.fy, cam.bf
    zero = jnp.zeros_like(z)
    a00, a01, a02 = -fx * iz, zero, fx * X * iz2
    a10, a11, a12 = zero, -fy * iz, fy * Y * iz2
    a20 = jnp.where(stereo_e, -fx * iz, 0.0)
    a21 = zero
    a22 = jnp.where(stereo_e, fx * X * iz2 - bf * iz2, 0.0)

    # Jc = A @ [I | -hat(pc)]  (pc = (X, Y, Z))
    # translation block: A itself; rotation block: A @ (-hat(pc))
    def rotblock(a0, a1, a2):
        # row (a0,a1,a2) @ (-hat([X,Y,Z])) with
        # -hat = [[0, Z, -Y], [-Z, 0, X], [Y, -X, 0]]
        return (a2 * Y - a1 * Z, a0 * Z - a2 * X, a1 * X - a0 * Y)

    b00, b01, b02 = rotblock(a00, a01, a02)
    b10, b11, b12 = rotblock(a10, a11, a12)
    b20, b21, b22 = rotblock(a20, a21, a22)
    Jc = jnp.stack([
        jnp.stack([a00, a01, a02, b00, b01, b02]),
        jnp.stack([a10, a11, a12, b10, b11, b12]),
        jnp.stack([a20, a21, a22, b20, b21, b22]),
    ])                                              # [3, 6, E]

    # Jp = A @ R
    R = _rot_cols(qw_, qx_, qy_, qz_)

    def jp_row(a0, a1, a2):
        return (a0 * R[0] + a1 * R[3] + a2 * R[6],
                a0 * R[1] + a1 * R[4] + a2 * R[7],
                a0 * R[2] + a1 * R[5] + a2 * R[8])

    Jp = jnp.stack([jnp.stack(jp_row(a00, a01, a02)),
                    jnp.stack(jp_row(a10, a11, a12)),
                    jnp.stack(jp_row(a20, a21, a22))])   # [3, 3, E]
    return ObsTermsE(r=r, Jc=Jc, Jp=Jp, w=w, chi2=chi2, cost=cost)


def cost_e(obs_kf, obs_uvr_t, inv_sigma2_e, stereo_e, active_base,
           q, t, pw, cam, delta2_m, delta2_s, use_huber: bool):
    """Robust cost only (for LM accept/reject) — no Jacobians."""
    E = obs_kf.shape[0]
    P = pw.shape[0]
    M = E // P
    pose_t = jnp.concatenate([q.T, t.T], axis=0)          # [7, K]
    g = jnp.take(pose_t, obs_kf, axis=1)                  # [7, E]
    qw_, qx_, qy_, qz_ = g[0], g[1], g[2], g[3]
    pwT = pw.T
    px = jnp.repeat(pwT[0], M)
    py = jnp.repeat(pwT[1], M)
    pz = jnp.repeat(pwT[2], M)
    cx_, cy_, cz_ = _quat_rotate_cols(qw_, qx_, qy_, qz_, px, py, pz)
    X = cx_ + g[4]
    Y = cy_ + g[5]
    Z = cz_ + g[6]
    z = jnp.maximum(Z, 1e-6)
    iz = 1.0 / z
    u = cam.fx * X * iz + cam.cx
    v = cam.fy * Y * iz + cam.cy
    ur = u - cam.bf * iz
    r0 = obs_uvr_t[0] - u
    r1 = obs_uvr_t[1] - v
    r2 = jnp.where(stereo_e, obs_uvr_t[2] - ur, 0.0)
    chi2 = (r0 * r0 + r1 * r1 + r2 * r2) * inv_sigma2_e
    active = active_base * (Z > 0.01)
    delta2 = jnp.where(stereo_e, delta2_s, delta2_m)
    if use_huber:
        delta = jnp.sqrt(delta2)
        rho = jnp.where(chi2 <= delta2, chi2,
                        2.0 * delta * jnp.sqrt(jnp.maximum(chi2, 1e-12))
                        - delta2)
    else:
        rho = chi2
    return jnp.sum(rho * active), chi2


def sym3_inv(H, damp):
    """Inverse of symmetric 3x3 blocks given as component arrays.

    H: tuple (h00,h01,h02,h11,h12,h22) each [P]; damp added to the diagonal
    (LM). Returns 6 component arrays of the inverse.
    """
    h00, h01, h02, h11, h12, h22 = H
    h00 = h00 + damp * h00 + 1e-8
    h11 = h11 + damp * h11 + 1e-8
    h22 = h22 + damp * h22 + 1e-8
    c00 = h11 * h22 - h12 * h12
    c01 = h02 * h12 - h01 * h22
    c02 = h01 * h12 - h02 * h11
    c11 = h00 * h22 - h02 * h02
    c12 = h01 * h02 - h00 * h12
    c22 = h00 * h11 - h01 * h01
    det = h00 * c00 + h01 * c01 + h02 * c02
    idet = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    return (c00 * idet, c01 * idet, c02 * idet,
            c11 * idet, c12 * idet, c22 * idet)


def pcg_solve(S_dense, rhs_flat, block_diag_inv, n_iters: int = 48,
              x0=None):
    """Block-Jacobi preconditioned CG for the reduced camera system.

    S_dense [D, D], rhs [D], block_diag_inv [K, 6, 6] with D = 6K. Fixed
    iteration count (LM tolerates inexact steps; accept/reject guards
    descent). x0 warm-starts from the previous LM iteration's solution —
    successive damped systems are close, roughly halving the iterations
    needed for the same step quality.
    """
    K = block_diag_inv.shape[0]

    def precond(v):
        return jnp.einsum("kij,kj->ki", block_diag_inv,
                          v.reshape(K, 6)).reshape(-1)

    def matvec(v):
        # widen the rhs to a 128-lane tile: the matmul reads S_dense (the
        # dominant memory traffic) once either way, but [D, D] @ [D, 128]
        # streams at MXU tile rate where [D, D] @ [D] runs ~40x slower
        vt = jnp.broadcast_to(v[:, None], (v.shape[0], 128))
        return (S_dense @ vt)[:, 0]

    if x0 is None:
        x0 = jnp.zeros_like(rhs_flat)
        r0 = rhs_flat
    else:
        r0 = rhs_flat - matvec(x0)
    z0 = precond(r0)
    p0 = z0

    def body(_, carry):
        x, r, z, p, rz = carry
        Ap = matvec(p)
        denom = jnp.dot(p, Ap)
        alpha = rz / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.dot(r, z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        p = z + beta * p
        return x, r, z, p, rz_new

    x, r, z, p, _ = jax.lax.fori_loop(
        0, n_iters, body, (x0, r0, z0, p0, jnp.dot(r0, z0)))
    return x


# ---------------------------------------------------------------------------
# Pallas PCG: the whole solver loop in one kernel, S resident in VMEM
# ---------------------------------------------------------------------------

def pcg_solve_pallas(S_dense, rhs_flat, block_diag_inv, n_iters: int = 48,
                     x0=None):
    """Same algorithm as pcg_solve, fused into a single Pallas kernel.

    The reduced camera matrix (6K)^2 f32 (9.4 MB at K=256) and a dense
    block-diagonal preconditioner matrix are DMA'd to VMEM once; all
    n_iters CG iterations then run on-chip — the XLA-loop variant pays HBM
    re-reads and op-dispatch overheads per iteration. The preconditioner
    apply is a second [1,D]@[D,D] matmul rather than a [K,6]-blocked
    reshape (lane->sublane shape casts are unsupported in Mosaic). Falls
    back to pcg_solve when the two matrices exceed the VMEM budget
    (K > ~512).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = S_dense.shape[0]
    K = block_diag_inv.shape[0]
    # S + dense preconditioner must fit the VMEM allowance alongside any
    # co-resident kernels in the same program (K <= ~360)
    if 2 * D * D * 4 > 40 * 1024 * 1024:
        return pcg_solve(S_dense, rhs_flat, block_diag_inv, n_iters, x0=x0)
    if x0 is not None:  # fold the warm start into the rhs residual
        rhs_flat = rhs_flat - S_dense @ x0

    # dense block-diagonal preconditioner P[(k,a),(k2,b)] = d(k,k2) Dinv[k,a,b]
    eyeK = jnp.eye(K, dtype=S_dense.dtype)
    Pmat = (block_diag_inv[:, :, None, :]
            * eyeK[:, None, :, None]).reshape(D, D)

    def kernel(S_ref, P_ref, rhs_ref, x_ref):
        S = S_ref[:]                       # [D, D] (symmetric)
        Pm = P_ref[:]                      # [D, D] (symmetric blocks)

        # explicit single-pass MXU precision: the engine-wide float32
        # matmul default (package __init__) would otherwise make Mosaic
        # emulate these dots in multiple passes — slower AND ~2 MB more
        # kernel stack, which overflowed the scoped-VMEM budget at D=1536.
        # CG tolerates the bf16 operand rounding (the preconditioned
        # residual recurrences stay f32; measured convergence parity in
        # tests/test_ba_fast.py).
        lo = jax.lax.Precision.DEFAULT

        def precond(r):                    # r [1, D]
            return jnp.dot(r, Pm, preferred_element_type=jnp.float32,
                           precision=lo)

        def matvec(p):
            return jnp.dot(p, S, preferred_element_type=jnp.float32,
                           precision=lo)

        r0 = rhs_ref[:]
        z0 = precond(r0)
        xinit = jnp.zeros_like(r0)

        def body(_, carry):
            x, r, z, p, rz = carry
            Ap = matvec(p)
            denom = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
            x = x + alpha * p
            r = r - alpha * Ap
            z = precond(r)
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
            p = z + beta * p
            return x, r, z, p, rz_new

        x, _, _, _, _ = jax.lax.fori_loop(
            0, n_iters, body, (xinit, r0, z0, z0, jnp.sum(r0 * z0)))
        x_ref[:] = x

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
    )(S_dense, Pmat, rhs_flat[None, :])
    return out[0] + x0 if x0 is not None else out[0]
