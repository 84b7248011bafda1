"""Batched EPnP + RANSAC for relocalization.

Replaces PnPsolver (reference include/PnPsolver.h, src/PnPsolver.cc — EPnP
with 4 control points, barycentric coordinates and a custom adaptive RANSAC,
budget (0.99, 10, 300, 4, 0.5, 5.991) set at src/Tracking.cc:1404).

TPU design: RANSAC hypotheses form a batch; every hypothesis solves EPnP on
an s-point subset via one batched 12x12 eigendecomposition; the dominant
(N=1) beta case recovers the control points in camera frame up to scale,
fixed by matching inter-control-point distances; the rigid transform comes
from the batched Horn solver. All hypotheses score against all matches in
one broadcast. A clean-subset hypothesis plus the pose_opt polish that
follows in relocalization replaces the reference's beta case-2/3 +
Gauss-Newton refinement stage.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import horn, se3
from .camera import Intrinsics


def _control_points(pw):
    """Centroid + principal axes control points [..., 4, 3]
    (reference choose_control_points)."""
    c = jnp.mean(pw, axis=-2, keepdims=True)
    d = pw - c
    cov = jnp.einsum("...ni,...nj->...ij", d, d) / pw.shape[-2]
    wvals, v = jnp.linalg.eigh(cov)
    scale = jnp.sqrt(jnp.maximum(wvals, 1e-9))[..., None, :]
    axes = jnp.swapaxes(v * scale, -1, -2)              # [..., 3(axis), 3]
    return jnp.concatenate([c, c + axes], axis=-2)      # [..., 4, 3]


def _barycentric(pw, cps):
    """alpha s.t. p = sum_j alpha_j c_j, sum alpha = 1 (compute_barycentric)."""
    base = cps[..., 1:, :] - cps[..., :1, :]            # [..., 3, 3]
    inv = jnp.linalg.inv(jnp.swapaxes(base, -1, -2) + 1e-9 * jnp.eye(3))
    rel = pw - cps[..., :1, :]
    a123 = jnp.einsum("...ij,...nj->...ni", inv, rel)
    a0 = 1.0 - jnp.sum(a123, axis=-1, keepdims=True)
    return jnp.concatenate([a0, a123], axis=-1)         # [..., n, 4]


def epnp_solve(pw, uv, cam: Intrinsics):
    """EPnP pose from correspondences pw [..., n, 3], uv [..., n, 2].

    Returns (q, t) world-to-camera. Batched over leading axes.
    """
    n = pw.shape[-2]
    cps = _control_points(pw)
    alpha = _barycentric(pw, cps)                       # [..., n, 4]

    # build M: rows for u and v per point (reference fill_M)
    xn = (uv[..., 0] - cam.cx) / cam.fx
    yn = (uv[..., 1] - cam.cy) / cam.fy
    zero = jnp.zeros_like(alpha)
    # row_u: [a0, 0, -a0*xn, a1, 0, -a1*xn, ...] over 4 control points
    ru = jnp.stack([alpha, zero, -alpha * xn[..., None]], axis=-1)  # [...,n,4,3]
    rv = jnp.stack([zero, alpha, -alpha * yn[..., None]], axis=-1)
    M = jnp.concatenate([ru.reshape(*ru.shape[:-3], n, 12),
                         rv.reshape(*rv.shape[:-3], n, 12)], axis=-2)
    MtM = jnp.einsum("...ni,...nj->...ij", M, M)
    _, vecs = jnp.linalg.eigh(MtM)
    v0 = vecs[..., :, 0]                                # smallest eigenvector
    cc = v0.reshape(*v0.shape[:-1], 4, 3)               # control pts (cam, ~scale)

    # N=1 beta: match inter-control-point distances
    def pdists(c):
        d = c[..., :, None, :] - c[..., None, :, :]
        return jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)

    dw = pdists(cps)
    dc = pdists(cc)
    beta = jnp.sum(dc * dw, axis=(-2, -1)) / jnp.maximum(
        jnp.sum(dc * dc, axis=(-2, -1)), 1e-12)
    cc = cc * beta[..., None, None]
    # cheirality: points must be in front — flip if mean z < 0
    pc = jnp.einsum("...nj,...jk->...nk", alpha, cc)
    flip = jnp.mean(pc[..., 2], axis=-1) < 0
    cc = jnp.where(flip[..., None, None], -cc, cc)

    # rigid transform world control points -> camera control points
    s, q, t = horn.horn_sim3(cps, cc, fix_scale=True)
    return q, t


class PnPRansacResult(NamedTuple):
    ok: jnp.ndarray
    q: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def epnp_ransac(pw, uv, sigma2, mask, cam: Intrinsics, key,
                n_iters: int = 300, sample: int = 6,
                min_inliers: int = 10, chi2_th: float = 5.991
                ) -> PnPRansacResult:
    """RANSAC over batched EPnP hypotheses (reference PnPsolver::iterate)."""
    N = pw.shape[0]
    keys = jax.random.split(key, n_iters)
    probs = mask.astype(jnp.float32) / jnp.maximum(jnp.sum(mask), 1)
    samples = jax.vmap(lambda k: jax.random.choice(
        k, N, shape=(sample,), replace=False, p=probs))(keys)

    q, t = epnp_solve(pw[samples], uv[samples], cam)     # [B, ...]

    pc = se3.apply(q[:, None, :], t[:, None, :], pw[None])
    z = jnp.maximum(pc[..., 2], 1e-6)
    u = cam.fx * pc[..., 0] / z + cam.cx
    v = cam.fy * pc[..., 1] / z + cam.cy
    err2 = ((u - uv[None, :, 0]) ** 2 + (v - uv[None, :, 1]) ** 2) / sigma2
    inl = (err2 < chi2_th) & (pc[..., 2] > 0.05) & mask[None]
    n_inl = jnp.sum(inl, axis=-1)
    best = jnp.argmax(n_inl)
    return PnPRansacResult(ok=n_inl[best] >= min_inliers, q=q[best],
                           t=t[best], inliers=inl[best],
                           n_inliers=n_inl[best])
