"""Batched SE(3) rigid transforms as (quaternion, translation) pairs.

TPU-first replacement for g2o::SE3Quat (reference:
Thirdparty/g2o/g2o/types/se3quat.h) and the cv::Mat 4x4 pose algebra used
throughout the reference (e.g. src/Tracking.cc velocity model, src/KeyFrame.cc
SetPose). All functions broadcast over arbitrary leading batch axes, so the
same code serves one pose, a keyframe table [K,...], or RANSAC hypothesis
batches [H,...]. Convention matches the reference: poses are world-to-camera
(Tcw); quaternions are (w, x, y, z), unit-norm, hemisphere-normalized on
construction.
"""
from __future__ import annotations

import jax.numpy as jnp

# Small-angle guard for exp/log Taylor branches.
_EPS = 1e-8


# ---------------------------------------------------------------------------
# Quaternion primitives (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_identity(shape=()):
    q = jnp.zeros(shape + (4,))
    return q.at[..., 0].set(1.0)


def quat_normalize(q):
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    # hemisphere convention: w >= 0 (keeps log/interp well-behaved)
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_mul(a, b):
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vectors v[..., 3] by unit quaternions q[..., 4]."""
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def quat_to_matrix(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(R):
    """Rotation matrix [..., 3, 3] -> quaternion, Shepperd's branchless form."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick the numerically largest pivot
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    qw = jnp.sqrt(jnp.maximum(qw, 0.0)) * 0.5
    w0, x1, y2, z3 = qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3]
    c0 = jnp.stack([w0, (m21 - m12) / (4 * w0 + _EPS),
                    (m02 - m20) / (4 * w0 + _EPS),
                    (m10 - m01) / (4 * w0 + _EPS)], axis=-1)
    c1 = jnp.stack([(m21 - m12) / (4 * x1 + _EPS), x1,
                    (m01 + m10) / (4 * x1 + _EPS),
                    (m02 + m20) / (4 * x1 + _EPS)], axis=-1)
    c2 = jnp.stack([(m02 - m20) / (4 * y2 + _EPS),
                    (m01 + m10) / (4 * y2 + _EPS), y2,
                    (m12 + m21) / (4 * y2 + _EPS)], axis=-1)
    c3 = jnp.stack([(m10 - m01) / (4 * z3 + _EPS),
                    (m02 + m20) / (4 * z3 + _EPS),
                    (m12 + m21) / (4 * z3 + _EPS), z3], axis=-1)
    idx = jnp.argmax(qw, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), axis=-2)
    return quat_normalize(q[..., 0, :])


# ---------------------------------------------------------------------------
# so(3) / se(3) exp & log
# ---------------------------------------------------------------------------

def safe_norm(x, axis=-1, keepdims=False):
    """sqrt(sum(x^2) + tiny): smooth at 0 so jacfwd/jacrev of exp maps taken
    at the identity (the LM linearization point) stay finite — plain
    jnp.linalg.norm has a NaN derivative at 0."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + 1e-24)


def _sinc(x):
    """sin(x)/x with Taylor fallback."""
    return jnp.where(jnp.abs(x) < 1e-4, 1.0 - x * x / 6.0, jnp.sin(x) / jnp.where(jnp.abs(x) < 1e-4, 1.0, x))


def so3_exp_quat(w):
    """Axis-angle vector [..., 3] -> unit quaternion."""
    theta = safe_norm(w, keepdims=True)
    half = 0.5 * theta
    qw = jnp.cos(half)
    qv = w * 0.5 * _sinc(half[..., 0])[..., None]
    return quat_normalize(jnp.concatenate([qw, qv], axis=-1))


def so3_log(q):
    """Unit quaternion -> axis-angle vector [..., 3]."""
    q = quat_normalize(q)
    sin_half = jnp.linalg.norm(q[..., 1:], axis=-1)
    cos_half = q[..., 0]
    half = jnp.arctan2(sin_half, cos_half)
    scale = jnp.where(sin_half < 1e-7, 2.0, 2.0 * half / jnp.maximum(sin_half, 1e-12))
    return q[..., 1:] * scale[..., None]


def hat(w):
    """[..., 3] -> skew-symmetric [..., 3, 3]."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    m = jnp.stack([z, -wz, wy, wz, z, -wx, -wy, wx, z], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def se3_exp(xi):
    """Twist xi = [..., 6] (rho, phi) -> (quat, trans).

    Matches the g2o SE3Quat::exp convention used by VertexSE3Expmap updates
    (translation part first is g2o's (omega, upsilon)? g2o uses update[0:3]=omega.
    Here: xi[..., :3] = translation part rho, xi[..., 3:] = rotation part phi.
    """
    rho, phi = xi[..., :3], xi[..., 3:]
    theta = safe_norm(phi, keepdims=True)
    q = so3_exp_quat(phi)
    # left Jacobian V of SO(3)
    Phi = hat(phi)
    Phi2 = Phi @ Phi
    t2 = jnp.maximum(theta * theta, _EPS)[..., None]
    small = (theta < 1e-4)[..., None]
    A = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta))[..., None] / t2)
    B = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (theta - jnp.sin(theta))[..., None] / (t2 * theta[..., None] + _EPS))
    V = jnp.eye(3) + A * Phi + B * Phi2
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return q, t


def se3_log(q, t):
    """(quat, trans) -> twist [..., 6] (rho, phi)."""
    phi = so3_log(q)
    theta = jnp.linalg.norm(phi, axis=-1, keepdims=True)
    Phi = hat(phi)
    Phi2 = Phi @ Phi
    half = 0.5 * theta
    small = (theta < 1e-4)[..., None]
    # V^{-1} = I - 0.5 Phi + coef Phi^2
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta[..., None] ** 2 / 720.0,
        (1.0 - half[..., None] * jnp.cos(half)[..., None]
         / jnp.maximum(jnp.sin(half), _EPS)[..., None])
        / jnp.maximum(theta, _EPS)[..., None] ** 2,
    )
    Vinv = jnp.eye(3) - 0.5 * Phi + cot_term * Phi2
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, phi], axis=-1)


# ---------------------------------------------------------------------------
# SE3 group ops on (quat, trans)
# ---------------------------------------------------------------------------

def compose(qa, ta, qb, tb):
    """T_a * T_b : first apply b, then a."""
    return quat_mul(qa, qb), quat_rotate(qa, tb) + ta


def inverse(q, t):
    qi = quat_conj(q)
    return qi, -quat_rotate(qi, t)


def apply(q, t, p):
    """Transform points p[..., 3]."""
    return quat_rotate(q, p) + t


def relative(qa, ta, qb, tb):
    """T_a * T_b^{-1} (pose of b's frame seen from a's)."""
    qbi, tbi = inverse(qb, tb)
    return compose(qa, ta, qbi, tbi)


def to_matrix44(q, t):
    R = quat_to_matrix(q)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def from_matrix44(T):
    return matrix_to_quat(T[..., :3, :3]), T[..., :3, 3]
