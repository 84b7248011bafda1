"""Monocular two-view bootstrap: parallel homography/fundamental RANSAC.

Replaces the reference Initializer (src/Initializer.cc, include/Initializer.h:
42-72): 200 RANSAC iterations of homography (8-pt DLT) and fundamental
(8-point) run in parallel, model selection by score ratio RH > 0.4, then
motion recovery — Faugeras decomposition for H (8 hypotheses) or essential
decomposition for F (4 hypotheses) — scored by cheirality + parallax of
triangulated matches.

TPU design: hypotheses are a batch axis. All 200 iterations compute their
models with batched SVD, all models score against all matches in one
broadcast, and all 8+4 motion hypotheses triangulate all matches in one
batched DLT — no early exit, fixed iteration budget (SURVEY.md §7 design
stance on RANSAC determinism).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import se3
from .camera import Intrinsics


class TwoViewResult(NamedTuple):
    ok: jnp.ndarray          # scalar bool
    q: jnp.ndarray           # [4] world-to-cam2 rotation (cam1 = identity)
    t: jnp.ndarray           # [3] unit-norm translation
    points: jnp.ndarray      # [N, 3] triangulated points in cam1 frame
    inliers: jnp.ndarray     # [N] bool triangulated-good mask
    used_homography: jnp.ndarray


def _normalize(x, mask):
    """Zero-mean unit-mean-abs-dev normalization (reference Normalize)."""
    n = jnp.maximum(jnp.sum(mask), 1)
    mean = jnp.sum(jnp.where(mask[:, None], x, 0.0), 0) / n
    d = jnp.where(mask[:, None], x - mean, 0.0)
    md = jnp.sum(jnp.abs(d), 0) / n
    s = 1.0 / jnp.maximum(md, 1e-9)
    xn = d * s
    T = jnp.array([[s[0], 0.0, -mean[0] * s[0]],
                   [0.0, s[1], -mean[1] * s[1]],
                   [0.0, 0.0, 1.0]])
    return xn, T


def _dlt_h(p1, p2):
    """Batched homography DLT from 8 correspondences [B, 8, 2] -> [B, 3, 3]."""
    B, S, _ = p1.shape
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], -1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], -1)
    A = jnp.concatenate([r1, r2], axis=1)          # [B, 16, 9]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[..., -1, :].reshape(B, 3, 3)


def _eight_point_f(p1, p2):
    """Batched fundamental from 8 correspondences -> [B, 3, 3], rank-2."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    o = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, o], -1)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[..., -1, :].reshape(-1, 3, 3)
    u, s, vt2 = jnp.linalg.svd(F)
    s = s.at[..., 2].set(0.0)
    return u @ (s[..., None] * vt2)


def _score_h(H, H_inv, x1, x2, mask, sigma: float = 1.0):
    """Symmetric transfer error score (reference CheckHomography)."""
    th = 5.991
    inv_s2 = 1.0 / (sigma * sigma)

    def transfer(M, a, b):
        """M [B,3,3], a/b [N,2] -> chi2 [B,N] of M*a vs b."""
        ah = jnp.concatenate([a, jnp.ones_like(a[:, :1])], -1)   # [N, 3]
        p = jnp.einsum("bij,nj->bni", M, ah)
        p = p[..., :2] / jnp.where(jnp.abs(p[..., 2:]) < 1e-9, 1e-9, p[..., 2:])
        return jnp.sum((b[None] - p) ** 2, -1) * inv_s2

    c1 = transfer(H_inv, x2, x1)   # [B, N]
    c2 = transfer(H, x1, x2)
    ok = (c1 < th) & (c2 < th) & mask[None]
    score = jnp.sum(jnp.where(ok, (th - c1) + (th - c2), 0.0), -1)
    return score, ok


def _score_f(F, x1, x2, mask, sigma: float = 1.0):
    """Epipolar distance score (reference CheckFundamental)."""
    th = 3.841
    th_score = 5.991
    inv_s2 = 1.0 / (sigma * sigma)
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], -1)   # [N, 3]
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], -1)
    l2 = x1h @ jnp.swapaxes(F, -1, -2)                 # [B, N, 3] lines in im2
    d2 = (jnp.sum(l2 * x2h[None], -1) ** 2
          / jnp.maximum(l2[..., 0] ** 2 + l2[..., 1] ** 2, 1e-12)) * inv_s2
    l1 = x2h @ F                                        # [B, N, 3] lines in im1
    d1 = (jnp.sum(l1 * x1h[None], -1) ** 2
          / jnp.maximum(l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-12)) * inv_s2
    ok = (d1 < th) & (d2 < th) & mask[None]
    score = jnp.sum(jnp.where((d1 < th) & mask[None], th_score - d1, 0.0)
                    + jnp.where((d2 < th) & mask[None], th_score - d2, 0.0), -1)
    return score, ok


def triangulate_batch(P1, P2, x1, x2):
    """Batched linear triangulation (reference Initializer::Triangulate):
    P1, P2 [..., 3, 4]; x1, x2 [..., 2] -> [..., 3] points (in frame of P1).
    """
    rows = [
        x1[..., 0:1] * P1[..., 2, :] - P1[..., 0, :],
        x1[..., 1:2] * P1[..., 2, :] - P1[..., 1, :],
        x2[..., 0:1] * P2[..., 2, :] - P2[..., 0, :],
        x2[..., 1:2] * P2[..., 2, :] - P2[..., 1, :],
    ]
    A = jnp.stack(rows, axis=-2)
    _, _, vt = jnp.linalg.svd(A)
    Xh = vt[..., -1, :]
    return Xh[..., :3] / jnp.where(jnp.abs(Xh[..., 3:]) < 1e-12, 1e-12,
                                   Xh[..., 3:])


def _check_rt(R, t, x1, x2, mask, cam: Intrinsics, sigma2: float = 1.0):
    """Cheirality + parallax + reprojection check of one motion hypothesis
    over all matches (reference CheckRT). Batched over leading hypothesis
    axes of R [..., 3, 3], t [..., 3].

    x1/x2 are normalized camera coords (K-less). Returns (n_good, parallax,
    good_mask, points3d in cam1).
    """
    th2 = 4.0 * sigma2  # reference: 4*sigma2 in normalized-pixel units
    shape = R.shape[:-2]
    P1 = jnp.zeros(shape + (3, 4)).at[..., 0, 0].set(1.0) \
        .at[..., 1, 1].set(1.0).at[..., 2, 2].set(1.0)
    P2 = jnp.concatenate([R, t[..., None]], -1)
    x1b = jnp.broadcast_to(x1, shape + x1.shape)
    x2b = jnp.broadcast_to(x2, shape + x2.shape)
    X = triangulate_batch(P1[..., None, :, :], P2[..., None, :, :], x1b, x2b)

    z1 = X[..., 2]
    Xc2 = jnp.einsum("...ij,...nj->...ni", R, X) + t[..., None, :]
    z2 = Xc2[..., 2]
    # parallax between rays
    o2 = -jnp.einsum("...ij,...i->...j", R, t)          # cam2 center in cam1
    r1 = X
    r2 = X - o2[..., None, :]
    cosp = jnp.sum(r1 * r2, -1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-12)
    # reprojection errors (normalized coords scaled by focal ~ pixel-equiv:
    # use pixels by scaling with fx)
    p1 = X[..., :2] / jnp.maximum(X[..., 2:], 1e-9)
    p2 = Xc2[..., :2] / jnp.maximum(Xc2[..., 2:], 1e-9)
    e1 = jnp.sum((p1 - x1b) ** 2, -1) * cam.fx * cam.fx
    e2 = jnp.sum((p2 - x2b) ** 2, -1) * cam.fx * cam.fx
    good = mask[None] & (z1 > 0) & (z2 > 0) & (cosp < 0.99998) \
        & (e1 < th2) & (e2 < th2)
    n_good = jnp.sum(good, -1)
    # parallax statistic: 50th-best parallax angle (reference takes the
    # 50th smallest cos -> we take median of good cosines)
    cosp_masked = jnp.where(good, cosp, 1.0)
    par = jnp.degrees(jnp.arccos(jnp.clip(jnp.sort(cosp_masked, -1)[
        ..., jnp.minimum(50, cosp.shape[-1] - 1)], -1.0, 1.0)))
    return n_good, par, good, X


def _decompose_e(E):
    """E -> 4 motion hypotheses (R [4, 3, 3], t [4, 3])."""
    u, s, vt = jnp.linalg.svd(E)
    # enforce proper rotations
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    t = u[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _decompose_h(H):
    """Faugeras SVD decomposition of a euclidean homography -> 8 hypotheses
    (reference ReconstructH, src/Initializer.cc:~480-620)."""
    U, w, Vt = jnp.linalg.svd(H)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = w[0], w[1], w[2]

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(
        d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(
        d1 * d1 - d3 * d3, 1e-12), 0.0))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    Rs, ts = [], []
    # case d' > 0
    sin_t = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3),
                                 0.0)) / jnp.maximum((d1 + d3) * d2, 1e-12)
    cos_t = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    for i in range(4):
        st = sin_t * jnp.where(x1s[i] * x3s[i] >= 0, 1.0, -1.0)
        Rp = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
        Rp = Rp.at[0, 0].set(cos_t).at[0, 2].set(-st) \
            .at[2, 0].set(st).at[2, 2].set(cos_t)
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1s[i], 0.0, -x3s[i]]) * (d1 - d3)
        t = U @ tp
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    # case d' < 0
    sin_p = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3),
                                 0.0)) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cos_p = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    for i in range(4):
        sp = sin_p * jnp.where(x1s[i] * x3s[i] >= 0, 1.0, -1.0)
        Rp = jnp.array([[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]])
        Rp = Rp.at[0, 0].set(cos_p).at[0, 2].set(sp) \
            .at[2, 0].set(sp).at[2, 2].set(-cos_p)
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1s[i], 0.0, x3s[i]]) * (d1 + d3)
        t = U @ tp
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    return jnp.stack(Rs), jnp.stack(ts)


def initialize_two_view(x1_px, x2_px, mask, cam: Intrinsics, key,
                        n_iters: int = 200, sigma: float = 1.0
                        ) -> TwoViewResult:
    """Full mono initialization from matched pixel coords x1_px/x2_px [N, 2].

    Returns motion (cam1 -> world identity, cam2 pose) and triangulated
    points. Scale is arbitrary (normalized translation), as the reference's
    (median-depth normalization happens in CreateInitialMapMonocular).
    """
    N = x1_px.shape[0]
    # RANSAC samples
    keys = jax.random.split(key, n_iters)
    probs = mask.astype(jnp.float32) / jnp.maximum(jnp.sum(mask), 1)
    samples = jax.vmap(lambda k: jax.random.choice(
        k, N, shape=(8,), replace=False, p=probs))(keys)   # [B, 8]

    xn1, T1 = _normalize(x1_px, mask)
    xn2, T2 = _normalize(x2_px, mask)
    s1 = xn1[samples]
    s2 = xn2[samples]

    # homography hypotheses
    Hn = _dlt_h(s1, s2)
    H = jnp.linalg.inv(T2) @ Hn @ T1            # denormalized, px -> px
    H = H / jnp.where(jnp.abs(H[:, 2:3, 2:3]) < 1e-12, 1e-12, H[:, 2:3, 2:3])
    h_scores, h_in = _score_h(H, jnp.linalg.inv(H), x1_px, x2_px, mask, sigma)
    bi_h = jnp.argmax(h_scores)
    SH = h_scores[bi_h]

    # fundamental hypotheses
    Fn = _eight_point_f(s1, s2)
    F = jnp.swapaxes(T2, 0, 1) @ Fn @ T1
    f_scores, f_in = _score_f(F, x1_px, x2_px, mask, sigma)
    bi_f = jnp.argmax(f_scores)
    SF = f_scores[bi_f]

    RH = SH / jnp.maximum(SH + SF, 1e-9)
    use_h = RH > 0.40

    # refit the winning models on all their inliers before decomposition
    # (the reference decomposes the best 8-point model directly; a masked
    # least-squares refit costs one more SVD and is noticeably tighter)
    def refit_h(w):
        x1n, y1n = xn1[:, 0], xn1[:, 1]
        x2n, y2n = xn2[:, 0], xn2[:, 1]
        z = jnp.zeros_like(x1n)
        o = jnp.ones_like(x1n)
        r1 = jnp.stack([z, z, z, -x1n, -y1n, -o, y2n * x1n, y2n * y1n, y2n], -1)
        r2 = jnp.stack([x1n, y1n, o, z, z, z, -x2n * x1n, -x2n * y1n, -x2n], -1)
        A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)
        _, _, vt = jnp.linalg.svd(A, full_matrices=True)
        Hn_fit = vt[-1].reshape(3, 3)
        Hf = jnp.linalg.inv(T2) @ Hn_fit @ T1
        return Hf / jnp.where(jnp.abs(Hf[2, 2]) < 1e-12, 1e-12, Hf[2, 2])

    def refit_f(w):
        x1n, y1n = xn1[:, 0], xn1[:, 1]
        x2n, y2n = xn2[:, 0], xn2[:, 1]
        o = jnp.ones_like(x1n)
        A = jnp.stack([x2n * x1n, x2n * y1n, x2n, y2n * x1n, y2n * y1n, y2n,
                       x1n, y1n, o], -1) * w[:, None]
        _, _, vt = jnp.linalg.svd(A, full_matrices=True)
        Ff = vt[-1].reshape(3, 3)
        u, s, vt2 = jnp.linalg.svd(Ff)
        Ff = u @ (s.at[2].set(0.0)[:, None] * vt2)
        return T2.T @ Ff @ T1

    H_best = refit_h(h_in[bi_h].astype(jnp.float32))
    F_best = refit_f(f_in[bi_f].astype(jnp.float32))

    # normalized camera coordinates for motion recovery
    Kinv = jnp.linalg.inv(cam.K)
    def to_norm(x):
        xh = jnp.concatenate([x, jnp.ones_like(x[:, :1])], -1)
        p = xh @ Kinv.T
        return p[:, :2]
    c1 = to_norm(x1_px)
    c2 = to_norm(x2_px)

    # H path: 8 hypotheses from the euclidean homography K^-1 H K
    He = Kinv @ H_best @ cam.K
    Rh, th = _decompose_h(He)
    # F path: 4 hypotheses from E = K^T F K
    E = cam.K.T @ F_best @ cam.K
    Rf, tf = _decompose_e(E)

    Rs = jnp.concatenate([Rh, Rf])              # [12, 3, 3]
    ts = jnp.concatenate([th, tf])
    hyp_valid = jnp.where(use_h,
                          jnp.arange(12) < 8, jnp.arange(12) >= 8)
    in_mask = jnp.where(use_h, h_in[bi_h], f_in[bi_f]) & mask

    n_good, par, good, X = _check_rt(Rs, ts, c1, c2, in_mask, cam,
                                     sigma2=sigma * sigma)
    n_good = jnp.where(hyp_valid, n_good, -1)
    best = jnp.argmax(n_good)
    n_best = n_good[best]
    n_second = jnp.sort(n_good)[-2]
    n_inliers = jnp.sum(in_mask)

    # acceptance (reference ReconstructF/H): clear winner, enough points,
    # enough parallax
    ok = (n_best > 0.7 * n_inliers) & (n_best > 40) \
        & (n_second < 0.75 * n_best) & (par[best] > 1.0)

    q = se3.matrix_to_quat(Rs[best])
    return TwoViewResult(ok=ok, q=q, t=ts[best], points=X[best],
                         inliers=good[best], used_homography=use_h)
