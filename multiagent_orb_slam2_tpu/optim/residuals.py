"""Reprojection residuals + analytic Jacobians shared by all optimizers.

Replaces the g2o edge types the reference instantiates
(EdgeSE3ProjectXYZ, EdgeStereoSE3ProjectXYZ, Edge*OnlyPose in
Thirdparty/g2o/g2o/types/types_six_dof_expmap.h). Convention follows the
reference: residual = observation - projection; poses are world-to-camera
Tcw perturbed on the left, Tcw' = exp(xi) * Tcw with xi = (rho, phi).

All functions are batched over an arbitrary leading observation axis. Stereo
observations are 3-vectors (u, v, u_right); monocular observations mask the
third row (weight 0) so one code path serves both edge types.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Intrinsics


def project_residual(cam: Intrinsics, q, t, pw, obs, is_stereo):
    """Residual r [..., 3] and camera-frame point pc for obs (u, v, u_r).

    Third component is zeroed for mono observations.
    """
    pc = se3.apply(q, t, pw)
    z = jnp.maximum(pc[..., 2], 1e-6)
    inv_z = 1.0 / z
    u = cam.fx * pc[..., 0] * inv_z + cam.cx
    v = cam.fy * pc[..., 1] * inv_z + cam.cy
    ur = u - cam.bf * inv_z
    pred = jnp.stack([u, v, ur], axis=-1)
    r = obs - pred
    r = r.at[..., 2].set(jnp.where(is_stereo, r[..., 2], 0.0))
    return r, pc


def proj_jacobian_point(cam: Intrinsics, pc, is_stereo):
    """d(residual)/d(pc): [..., 3, 3] (sign: r = obs - proj => J = -dproj/dpc)."""
    x, y = pc[..., 0], pc[..., 1]
    z = jnp.maximum(pc[..., 2], 1e-6)
    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z
    zero = jnp.zeros_like(x)
    row_u = jnp.stack([cam.fx * inv_z, zero, -cam.fx * x * inv_z2], axis=-1)
    row_v = jnp.stack([zero, cam.fy * inv_z, -cam.fy * y * inv_z2], axis=-1)
    row_r = jnp.stack([cam.fx * inv_z, zero,
                       -cam.fx * x * inv_z2 + cam.bf * inv_z2], axis=-1)
    row_r = jnp.where(is_stereo[..., None], row_r, 0.0)
    return -jnp.stack([row_u, row_v, row_r], axis=-2)


def jacobians(cam: Intrinsics, q, t, pw, is_stereo):
    """(J_pose [..., 3, 6], J_point [..., 3, 3], pc).

    J_pose columns follow xi = (rho, phi): d pc/d xi = [I | -hat(pc)].
    J_point chains through R (d pc/d pw = R).
    """
    pc = se3.apply(q, t, pw)
    Jproj = proj_jacobian_point(cam, pc, is_stereo)   # [..., 3, 3]
    dpc_drho = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape + (3,))
    dpc_dphi = -se3.hat(pc)
    J_pose = jnp.concatenate([Jproj @ dpc_drho, Jproj @ dpc_dphi], axis=-1)
    R = se3.quat_to_matrix(q)
    J_point = Jproj @ R
    return J_pose, J_point, pc


def huber_weight(chi2, delta2):
    """Huber IRLS weight as a function of squared error (g2o RobustKernelHuber:
    rho'(chi2) = min(1, delta/sqrt(chi2)))."""
    return jnp.minimum(1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))
