"""Closed-form Sim3 from 3D-3D correspondences (Horn 1987) + batched RANSAC.

Replaces Sim3Solver (reference src/Sim3Solver.cc:226-320 ComputeSim3 — Horn's
quaternion absolute orientation via the 4x4 N-matrix eigenvector — and
`iterate`, the custom RANSAC used by loop closing and map fusion with budget
RANSAC(0.99, 20, 300), src/LoopClosing.cc:324 / src/MapFusion.cc:285,311).

TPU design: all RANSAC hypotheses are one batch — 3-point samples gathered
up front, batched 4x4 symmetric eigendecompositions, and one broadcast
inlier check of every hypothesis against every correspondence in both
images. Fixed iteration budget, no early exit.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import se3
from .camera import Intrinsics


def horn_sim3(p1, p2, fix_scale: bool = False):
    """Batched Horn absolute orientation: p1, p2 [..., N, 3] -> (s, q, t)
    mapping frame-1 points into frame 2: p2 ~ s R p1 + t."""
    c1 = jnp.mean(p1, axis=-2, keepdims=True)
    c2 = jnp.mean(p2, axis=-2, keepdims=True)
    r1 = p1 - c1
    r2 = p2 - c2
    M = jnp.einsum("...ni,...nj->...ij", r1, r2)      # [..., 3, 3]
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N = jnp.stack([
        jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
        jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
        jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
        jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
    ], axis=-2)                                        # [..., 4, 4]
    w, v = jnp.linalg.eigh(N)
    q = v[..., :, -1]                                  # largest eigenvalue
    q = se3.quat_normalize(q)
    r1_rot = se3.quat_rotate(q[..., None, :], r1)
    if fix_scale:
        s = jnp.ones(q.shape[:-1])
    else:
        # reference: s = sum(r2 . R r1) / sum(|r1|^2)
        s = jnp.sum(r2 * r1_rot, axis=(-2, -1)) / jnp.maximum(
            jnp.sum(r1 * r1, axis=(-2, -1)), 1e-12)
    t = c2[..., 0, :] - s[..., None] * se3.quat_rotate(q, c1[..., 0, :])
    return s, q, t


class Sim3RansacResult(NamedTuple):
    ok: jnp.ndarray
    s: jnp.ndarray
    q: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray      # [N] bool
    n_inliers: jnp.ndarray


def sim3_ransac(p1, p2, uv1, uv2, sigma2_1, sigma2_2, mask,
                cam: Intrinsics, key, n_iters: int = 300,
                min_inliers: int = 20, fix_scale: bool = False
                ) -> Sim3RansacResult:
    """RANSAC Sim3 between matched MapPoint clouds of two keyframes.

    p1/p2: [N, 3] matched points in each keyframe's CAMERA frame (the
    reference transforms to camera frame first, src/Sim3Solver.cc:66-104).
    uv1/uv2: [N, 2] observed pixels in each keyframe. Inlier check is
    bidirectional reprojection below 9.21 * sigma2 (src/Sim3Solver.cc:
    SetRansacParameters mvnMaxError).
    """
    N = p1.shape[0]
    keys = jax.random.split(key, n_iters)
    probs = mask.astype(jnp.float32) / jnp.maximum(jnp.sum(mask), 1)
    samples = jax.vmap(lambda k: jax.random.choice(
        k, N, shape=(3,), replace=False, p=probs))(keys)   # [B, 3]

    s, q, t = horn_sim3(p1[samples], p2[samples], fix_scale)  # [B]

    def project(p):
        z = jnp.maximum(p[..., 2], 1e-6)
        return jnp.stack([cam.fx * p[..., 0] / z + cam.cx,
                          cam.fy * p[..., 1] / z + cam.cy], axis=-1)

    # hypothesis x point: map p1 -> frame2, p2 -> frame1
    p1_in2 = (s[:, None, None] * se3.quat_rotate(q[:, None, :], p1[None])
              + t[:, None, :])
    si, qi, ti = (1.0 / s, se3.quat_conj(q), None)
    ti = -si[:, None] * se3.quat_rotate(qi, t)
    p2_in1 = (si[:, None, None] * se3.quat_rotate(qi[:, None, :], p2[None])
              + ti[:, None, :])
    e2 = jnp.sum((project(p1_in2) - uv2[None]) ** 2, -1)   # [B, N]
    e1 = jnp.sum((project(p2_in1) - uv1[None]) ** 2, -1)
    inl = (e1 < 9.21 * sigma2_1[None]) & (e2 < 9.21 * sigma2_2[None]) \
        & mask[None]
    n_inl = jnp.sum(inl, -1)
    best = jnp.argmax(n_inl)
    ok = n_inl[best] >= min_inliers
    return Sim3RansacResult(ok=ok, s=s[best], q=q[best], t=t[best],
                            inliers=inl[best], n_inliers=n_inl[best])
