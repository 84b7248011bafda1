"""Pallas TPU kernels for the BA fast path.

Why: the XLA formulation of the per-observation residual/Jacobian/Schur
preparation is ~150 small elementwise HLO ops per LM iteration; at bench
scale each op execution carries ~30 us of fixed overhead, so the pile costs
~10-12 ms/iter while its true memory traffic is worth ~0.5 ms
(tools/PROFILE_FINDINGS.md, device-trace accounting). One fused kernel
bounds it by actual HBM traffic.

Layout: observations are M-MAJOR here — arrays are [*, M, P] with points in
the lane dimension. Per-point reductions (Hpp, bp) become sublane reductions
over the M=8 rows, and per-point broadcasts (Hpp^-1 into Y) are free sublane
broadcasts — the p-major [P, M] layout would need strided lane reductions
the VPU can't do natively.

Replaces (for the TPU path) the prep half of optim.ba._build_and_solve_fast:
obs_terms_e + sym3 point blocks + the Wb/Y/Hterms/bterms/Ybp stacks
(reference semantics: robust reprojection residuals and the Schur-eliminated
normal equations of src/Optimizer.cc:41-239).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry.camera import Intrinsics


def _prep_kernel(lam_ref, g_ref, uvr_ref, isig_ref, st_ref, act_ref, pw_ref,
                 Wb_ref, Y_ref, Ht_ref, bt_ref, Ybp_ref, hinv_ref, bp_ref,
                 cost_ref, chi2_ref, *, cam: Intrinsics, delta2_m: float,
                 delta2_s: float, use_huber: bool, M: int):
    lam = lam_ref[0, 0]
    g = g_ref[:]              # [7, M, PB]
    qw, qx, qy, qz = g[0], g[1], g[2], g[3]
    tx, ty, tz = g[4], g[5], g[6]
    pw = pw_ref[:]            # [3, PB]
    px = jnp.broadcast_to(pw[0][None, :], qw.shape)
    py = jnp.broadcast_to(pw[1][None, :], qw.shape)
    pz = jnp.broadcast_to(pw[2][None, :], qw.shape)

    # quaternion rotate + translate (camera-frame point)
    cx1 = 2.0 * (qy * pz - qz * py)
    cy1 = 2.0 * (qz * px - qx * pz)
    cz1 = 2.0 * (qx * py - qy * px)
    X = px + qw * cx1 + (qy * cz1 - qz * cy1) + tx
    Yc = py + qw * cy1 + (qz * cx1 - qx * cz1) + ty
    Z = pz + qw * cz1 + (qx * cy1 - qy * cx1) + tz

    z_ok = Z > 0.01
    z = jnp.maximum(Z, 1e-6)
    iz = pl.reciprocal(z, approx=False)
    iz2 = iz * iz

    fx, fy, bf = cam.fx, cam.fy, cam.bf
    u = fx * X * iz + cam.cx
    v = fy * Yc * iz + cam.cy
    ur = u - bf * iz
    uvr = uvr_ref[:]
    stereo = st_ref[:] > 0.5
    r0 = uvr[0] - u
    r1 = uvr[1] - v
    r2 = jnp.where(stereo, uvr[2] - ur, 0.0)

    isig = isig_ref[:]
    chi2 = (r0 * r0 + r1 * r1 + r2 * r2) * isig
    active = act_ref[:] * z_ok.astype(jnp.float32)
    delta2 = jnp.where(stereo, delta2_s, delta2_m)
    if use_huber:
        w_rob = jnp.minimum(1.0, jnp.sqrt(
            delta2 / jnp.maximum(chi2, 1e-12)))
        delta = jnp.sqrt(delta2)
        rho = jnp.where(chi2 <= delta2, chi2,
                        2.0 * delta * jnp.sqrt(jnp.maximum(chi2, 1e-12))
                        - delta2)
    else:
        w_rob = jnp.ones_like(chi2)
        rho = chi2
    w = isig * w_rob * active
    cost_ref[:] = rho * active          # [M, PB]; summed by the caller
    chi2_ref[:] = chi2                  # raw chi2 (outlier gating)

    # projection Jacobian rows (r = obs - proj => J = -dproj)
    zero = jnp.zeros_like(z)
    a00, a01, a02 = -fx * iz, zero, fx * X * iz2
    a10, a11, a12 = zero, -fy * iz, fy * Yc * iz2
    a20 = jnp.where(stereo, -fx * iz, 0.0)
    a21 = zero
    a22 = jnp.where(stereo, fx * X * iz2 - bf * iz2, 0.0)
    A = ((a00, a01, a02), (a10, a11, a12), (a20, a21, a22))

    # Jc = A @ [I | -hat(pc)] : translation block A, rotation block A(-hat)
    def rotblock(a0, a1, a2):
        return (a2 * Yc - a1 * Z, a0 * Z - a2 * X, a1 * X - a0 * Yc)

    Jc = [[None] * 6 for _ in range(3)]
    for r_i in range(3):
        a0, a1, a2 = A[r_i]
        b0, b1, b2 = rotblock(a0, a1, a2)
        Jc[r_i] = [a0, a1, a2, b0, b1, b2]

    # Jp = A @ R (rotation matrix entries from the quaternion)
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    R9 = (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
          2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
          2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy))
    Jp = [[None] * 3 for _ in range(3)]
    for r_i in range(3):
        a0, a1, a2 = A[r_i]
        Jp[r_i] = [a0 * R9[0] + a1 * R9[3] + a2 * R9[6],
                   a0 * R9[1] + a1 * R9[4] + a2 * R9[7],
                   a0 * R9[2] + a1 * R9[5] + a2 * R9[8]]

    # point blocks: Hpp (6 sym comps) + bp, reduced over the M sublanes
    rr = (r0, r1, r2)
    hcomp = []
    for (a, b) in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)):
        s = (Jp[0][a] * Jp[0][b] + Jp[1][a] * Jp[1][b]
             + Jp[2][a] * Jp[2][b]) * w
        hcomp.append(jnp.sum(s, axis=0, keepdims=True))     # [1, PB]
    bp3 = []
    for b in range(3):
        s = (Jp[0][b] * rr[0] + Jp[1][b] * rr[1] + Jp[2][b] * rr[2]) * w
        bp3.append(-jnp.sum(s, axis=0, keepdims=True))      # [1, PB]
    bp_ref[:] = jnp.concatenate(bp3, axis=0)                # [3, PB]

    # damped symmetric 3x3 inverse (per point)
    h00 = hcomp[0] * (1.0 + lam) + 1e-8
    h01, h02 = hcomp[1], hcomp[2]
    h11 = hcomp[3] * (1.0 + lam) + 1e-8
    h12 = hcomp[4]
    h22 = hcomp[5] * (1.0 + lam) + 1e-8
    c00 = h11 * h22 - h12 * h12
    c01 = h02 * h12 - h01 * h22
    c02 = h01 * h12 - h02 * h11
    c11 = h00 * h22 - h02 * h02
    c12 = h01 * h02 - h00 * h12
    c22 = h00 * h11 - h01 * h01
    det = h00 * c00 + h01 * c01 + h02 * c02
    idet = pl.reciprocal(jnp.where(jnp.abs(det) < 1e-20, 1e-20, det),
                         approx=False)
    Hi = {(0, 0): c00 * idet, (0, 1): c01 * idet, (0, 2): c02 * idet,
          (1, 0): c01 * idet, (1, 1): c11 * idet, (1, 2): c12 * idet,
          (2, 0): c02 * idet, (2, 1): c12 * idet, (2, 2): c22 * idet}

    # Wb[(c,a)] = sum_r Jc[r][a] * Jp[r][c] * w      (c-major rows)
    Wb = {}
    wb_rows = []
    for c in range(3):
        for a in range(6):
            val = (Jc[0][a] * Jp[0][c] + Jc[1][a] * Jp[1][c]
                   + Jc[2][a] * Jp[2][c]) * w
            Wb[(c, a)] = val
            wb_rows.append(val)
    Wb_ref[:] = jnp.stack(wb_rows)                          # [18, M, PB]

    # Y[(c,a)] = sum_k Wb[(k,a)] * Hinv[k,c]  (Hinv broadcast over M)
    Ybp = [jnp.zeros_like(w) for _ in range(6)]
    bpv = tuple(jnp.broadcast_to(bp3[c], w.shape) for c in range(3))
    y_rows = []
    for c in range(3):
        for a in range(6):
            val = (Wb[(0, a)] * jnp.broadcast_to(Hi[(0, c)], w.shape)
                   + Wb[(1, a)] * jnp.broadcast_to(Hi[(1, c)], w.shape)
                   + Wb[(2, a)] * jnp.broadcast_to(Hi[(2, c)], w.shape))
            y_rows.append(val)
            Ybp[a] = Ybp[a] + val * bpv[c]
    Y_ref[:] = jnp.stack(y_rows)                            # [18, M, PB]
    Ybp_ref[:] = jnp.stack(Ybp)                             # [6, M, PB]

    # pose-diagonal terms Ht[(a,b)] (a-major, full 36) and bt[a]
    ht_rows = []
    for a in range(6):
        for b in range(6):
            ht_rows.append((Jc[0][a] * Jc[0][b] + Jc[1][a] * Jc[1][b]
                            + Jc[2][a] * Jc[2][b]) * w)
    Ht_ref[:] = jnp.stack(ht_rows)                          # [36, M, PB]
    bt_rows = []
    for a in range(6):
        bt_rows.append(-(Jc[0][a] * rr[0] + Jc[1][a] * rr[1]
                         + Jc[2][a] * rr[2]) * w)
    bt_ref[:] = jnp.stack(bt_rows)                          # [6, M, PB]

    hinv_ref[:] = jnp.concatenate(
        [Hi[(0, 0)], Hi[(0, 1)], Hi[(0, 2)],
         Hi[(1, 1)], Hi[(1, 2)], Hi[(2, 2)]], axis=0)       # [6, PB]


@functools.partial(jax.jit,
                   static_argnames=("cam", "delta2_m", "delta2_s",
                                    "use_huber", "pb"))
def prep_terms(lam, g, uvr_m, isig_m, stereo_m, active_m, pw,
               cam: Intrinsics, delta2_m: float, delta2_s: float,
               use_huber: bool, pb: int = 1024):
    """Fused Schur-prep over all observations (m-major).

    g [7, M, P] gathered poses; uvr_m [3, M, P]; isig/stereo/active [M, P]
    (f32 masks); pw [3, P]. Returns (Wb, Y, Ht, bt, Ybp, hinv6, bp, cost)
    with Wb/Y [18, M, P] (c-major row order), Ht [36, M, P] (a-major),
    bt/Ybp [6, M, P], hinv6 [6, P], bp [3, P], cost scalar.
    """
    _, M, P = g.shape
    grid = (P // pb,)

    def im3(i):
        return (0, 0, i)

    def im2(i):
        return (0, i)

    kern = functools.partial(_prep_kernel, cam=cam, delta2_m=delta2_m,
                             delta2_s=delta2_s, use_huber=use_huber, M=M)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((7, M, pb), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, M, pb), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, pb), im2, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, pb), im2, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, pb), im2, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, pb), im2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((18, M, pb), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((18, M, pb), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((36, M, pb), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((6, M, pb), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((6, M, pb), im3, memory_space=pltpu.VMEM),
            pl.BlockSpec((6, pb), im2, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, pb), im2, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, pb), im2, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, pb), im2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((18, M, P), jnp.float32),
            jax.ShapeDtypeStruct((18, M, P), jnp.float32),
            jax.ShapeDtypeStruct((36, M, P), jnp.float32),
            jax.ShapeDtypeStruct((6, M, P), jnp.float32),
            jax.ShapeDtypeStruct((6, M, P), jnp.float32),
            jax.ShapeDtypeStruct((6, P), jnp.float32),
            jax.ShapeDtypeStruct((3, P), jnp.float32),
            jax.ShapeDtypeStruct((M, P), jnp.float32),
            jax.ShapeDtypeStruct((M, P), jnp.float32),
        ],
        # pb=1024 uses ~13 MB double-buffered; keep the declared allowance
        # tight — scoped-vmem demands of co-resident kernels in one XLA
        # program ADD UP against the 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024),
    )(jnp.asarray(lam, jnp.float32).reshape(1, 1), g, uvr_m, isig_m,
      stereo_m, active_m, pw)
    Wb, Y, Ht, bt, Ybp, hinv6, bp, cost_e, chi2_m = out
    return Wb, Y, Ht, bt, Ybp, hinv6, bp, jnp.sum(cost_e), chi2_m
