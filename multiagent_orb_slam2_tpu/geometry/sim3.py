"""Batched Sim(3) similarity transforms (s, quaternion, translation).

Replaces g2o::Sim3 (reference: Thirdparty/g2o/g2o/types/sim3.h), used by the
loop-closing / map-fusion Sim3 pipeline (src/LoopClosing.cc ComputeSim3,
src/MapFusion.cc FuseMaps pose correction, src/Optimizer.cc
OptimizeEssentialGraph / OptimizeSim3). Layout: scalar scale s, unit quat q
(w,x,y,z), translation t. Action: x -> s * R x + t.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import se3


def identity(shape=()):
    return (jnp.ones(shape), se3.quat_identity(shape), jnp.zeros(shape + (3,)))


def apply(s, q, t, p):
    return s[..., None] * se3.quat_rotate(q, p) + t


def compose(sa, qa, ta, sb, qb, tb):
    """S_a * S_b (apply b first)."""
    s = sa * sb
    q = se3.quat_mul(qa, qb)
    t = sa[..., None] * se3.quat_rotate(qa, tb) + ta
    return s, q, t


def inverse(s, q, t):
    si = 1.0 / s
    qi = se3.quat_conj(q)
    ti = -si[..., None] * se3.quat_rotate(qi, t)
    return si, qi, ti


def from_se3(q, t):
    return jnp.ones(q.shape[:-1], q.dtype), q, t


def to_se3(s, q, t):
    """Project to SE3 the way the reference recovers poses after essential-graph
    optimization: divide translation by scale (src/Optimizer.cc:1003-1006,
    eigt *= (1./s))."""
    return q, t / s[..., None]


# --- sim3 log/exp (7-vector: rho, phi, sigma) for pose-graph optimization ---

def log(s, q, t):
    """Sim3 -> [..., 7] twist (rho, phi, log s). Uses the W matrix of Sim(3)."""
    phi = se3.so3_log(q)
    sigma = jnp.log(s)
    W = _W_matrix(phi, sigma)
    Winv = jnp.linalg.inv(W)
    rho = jnp.einsum("...ij,...j->...i", Winv, t)
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def exp(xi):
    """[..., 7] twist (rho, phi, sigma) -> (s, q, t)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    q = se3.so3_exp_quat(phi)
    W = _W_matrix(phi, sigma)
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return s, q, t


def _W_matrix(phi, sigma):
    """The Sim(3) 'W' integral matrix (Strasdat's thesis eq. for exp).

    W = A * I + B * Phi + C * Phi^2 with scale-coupled coefficients.
    """
    eps = 1e-6
    theta = se3.safe_norm(phi)
    Phi = se3.hat(phi)
    Phi2 = Phi @ Phi
    s = jnp.exp(sigma)

    sig_small = jnp.abs(sigma) < eps
    th_small = theta < eps
    sigma_safe = jnp.where(sig_small, 1.0, sigma)
    theta_safe = jnp.where(th_small, 1.0, theta)

    # A = (s - 1) / sigma
    A = jnp.where(sig_small, 1.0 + sigma / 2.0, (s - 1.0) / sigma_safe)

    # a = s*sin(theta), b = s*cos(theta)
    a = s * jnp.sin(theta)
    b = s * jnp.cos(theta)
    th2 = theta_safe * theta_safe
    sig2 = sigma_safe * sigma_safe
    denom = jnp.where(sig_small & th_small, 1.0, sig2 + th2)

    # B = (a*sigma + (1-b)*theta) / (theta * (sigma^2 + theta^2))
    B_general = (a * sigma + (1.0 - b) * theta) / (theta_safe * denom)
    B_sig0 = jnp.where(th_small, 0.5, (1.0 - jnp.cos(theta_safe)) / th2)
    B = jnp.where(sig_small, B_sig0,
                  jnp.where(th_small, _B_theta0(sigma_safe, s), B_general))

    # C = (A - (b-1)*sigma/denom - a*theta/denom) / theta^2   [general]
    C_general = (A - ((b - 1.0) * sigma + a * theta) / denom) / th2
    C_sig0 = jnp.where(th_small, 1.0 / 6.0, (theta_safe - jnp.sin(theta_safe)) / (th2 * theta_safe))
    C = jnp.where(sig_small, C_sig0, jnp.where(th_small, _C_theta0(sigma_safe, s), C_general))

    I = jnp.eye(3, dtype=phi.dtype)
    return (A[..., None, None] * I + B[..., None, None] * Phi
            + C[..., None, None] * Phi2)


def _B_theta0(sigma, s):
    # lim theta->0 of B: ((sigma-1)*s + 1) / sigma^2
    return ((sigma - 1.0) * s + 1.0) / (sigma * sigma)


def _C_theta0(sigma, s):
    # lim theta->0 of C: (s*(0.5*sigma^2 - sigma + 1) - 1) / sigma^3
    return (s * (0.5 * sigma * sigma - sigma + 1.0) - 1.0) / (sigma ** 3)
