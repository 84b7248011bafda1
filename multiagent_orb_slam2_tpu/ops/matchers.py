"""Batched binary-descriptor matching: all ORBmatcher entry points as masked
candidate generation + packed-Hamming argmin.

The reference ORBmatcher (src/ORBmatcher.cc, 12 entry points, SURVEY.md §2c)
loops over features and consults a spatial grid; here every search is:

  1. candidate mask [Q, F]   (projection window / epipolar band / all-pairs)
  2. Hamming distances       (ops.hamming)
  3. masked argmin + ratio test per query
  4. optional rotation-consistency histogram filter
  5. conflict resolution     (one query per target feature, best distance wins)

Thresholds follow the reference: TH_HIGH=100, TH_LOW=50, HISTO_LENGTH=30
(src/ORBmatcher.cc:37-39).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MatcherConfig
from ..geometry import se3
from ..geometry.camera import Intrinsics
from . import hamming
from .frame import FrameFeatures


class MatchResult(NamedTuple):
    best_feat: jnp.ndarray   # [Q] int32 best frame-feature per query (-1)
    best_dist: jnp.ndarray   # [Q] int32
    ok: jnp.ndarray          # [Q] bool


def project_points(cam: Intrinsics, q, t, pw):
    """World points -> (uv [N,2], u_right [N], depth [N], visible mask)."""
    pc = se3.apply(q, t, pw)
    z = pc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * pc[..., 0] * inv_z + cam.cx
    v = cam.fy * pc[..., 1] * inv_z + cam.cy
    ur = u - cam.bf * inv_z
    uv = jnp.stack([u, v], axis=-1)
    vis = (z > 0.05) & (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
    return uv, ur, z, vis


def match_window(frame: FrameFeatures, query_desc, query_mask, pred_uv,
                 radius, pred_ur=None, pred_level=None, level_tol: int = 1,
                 th: int = 100, nn_ratio: float = 1.0) -> MatchResult:
    """Window-constrained matching of Q query descriptors into a frame.

    Covers SearchByProjection for local-map points (src/ORBmatcher.cc:45),
    frame-to-frame (:1330), relocalization (:1474) and Sim3 world points
    (:292): callers differ only in how pred_uv/radius/level are produced.
    """
    dx = jnp.abs(frame.xy[None, :, 0] - pred_uv[:, None, 0])
    dy = jnp.abs(frame.xy[None, :, 1] - pred_uv[:, None, 1])
    r = jnp.broadcast_to(jnp.asarray(radius, jnp.float32),
                         (pred_uv.shape[0],))[:, None]
    cand = (dx < r) & (dy < r) & frame.valid[None, :] & query_mask[:, None]
    if pred_level is not None:
        lvl_d = frame.level[None, :] - pred_level[:, None]
        cand &= (lvl_d >= -level_tol) & (lvl_d <= level_tol)
    if pred_ur is not None:
        # stereo coherence where the frame has a right-image match
        has_r = frame.u_right[None, :] >= 0
        ur_ok = jnp.abs(frame.u_right[None, :] - pred_ur[:, None]) < r
        cand &= jnp.where(has_r, ur_ok, True)

    dist = hamming.hamming_matrix(query_desc, frame.desc)
    idx, best, second = hamming.masked_argmin(dist, cand)
    ok = query_mask & (best <= th)
    if nn_ratio < 1.0:
        ok &= best.astype(jnp.float32) <= nn_ratio * second.astype(jnp.float32)
    return MatchResult(jnp.where(ok, idx, -1), best, ok)


def match_brute(query_desc, query_mask, frame_desc, frame_mask,
                th: int = 50, nn_ratio: float = 0.7) -> MatchResult:
    """Unconstrained descriptor matching with ratio test.

    Serves where the reference restricts brute force to shared DBoW2
    FeatureVector nodes (SearchByBoW KF<->Frame :161 and KF<->KF :524): the
    vocabulary-node restriction is a CPU pruning trick; on TPU the full
    [Q, F] Hamming matrix is one fused op, and the ratio + threshold gates
    provide the same selectivity.
    """
    dist = hamming.hamming_matrix(query_desc, frame_desc)
    cand = query_mask[:, None] & frame_mask[None, :]
    idx, best, second = hamming.masked_argmin(dist, cand)
    ok = query_mask & (best <= th) \
        & (best.astype(jnp.float32) <= nn_ratio * second.astype(jnp.float32))
    return MatchResult(jnp.where(ok, idx, -1), best, ok)


def rotation_consistency(query_angle, frame_angle, res: MatchResult,
                         histo_length: int = 30, keep_bins: int = 3):
    """Keep only matches whose angle difference falls in the `keep_bins` most
    popular histogram bins (reference ComputeThreeMaxima + HISTO_LENGTH=30
    filtering used by every matcher)."""
    feat = jnp.clip(res.best_feat, 0, frame_angle.shape[0] - 1)
    dang = query_angle - frame_angle[feat]
    two_pi = 2.0 * jnp.pi
    dang = jnp.mod(dang, two_pi)
    bins = jnp.floor(dang / two_pi * histo_length).astype(jnp.int32)
    bins = jnp.clip(bins, 0, histo_length - 1)
    hist = jax.ops.segment_sum(res.ok.astype(jnp.int32),
                               jnp.where(res.ok, bins, histo_length),
                               num_segments=histo_length + 1)[:histo_length]
    top = jax.lax.top_k(hist, keep_bins)[0]
    # reference rule: drop bins below 0.1x the max bin
    th = jnp.maximum(top[keep_bins - 1], (0.1 * top[0]).astype(hist.dtype))
    good_bin = hist >= jnp.maximum(th, 1)
    return res._replace(ok=res.ok & good_bin[bins],
                        best_feat=jnp.where(res.ok & good_bin[bins],
                                            res.best_feat, -1))


def resolve_conflicts(res: MatchResult, n_feats: int, query_ids=None):
    """One query per frame feature: keep the smallest distance claimant.

    Returns frame_assign [F] int32 = winning query id (-1 none) and an
    updated per-query ok mask.

    Formulated as a dense [Q, F] masked min/argmin instead of scatter-min:
    TPU scatters serialize (each cost ~2.6 ms per 2048 updates — measured,
    tools/PROFILE_FINDINGS.md 'tracking attribution'); the dense matrix is
    a few hundred microseconds. argmin's first-minimum rule provides the
    lowest-claimant tie-break directly.
    """
    Q = res.best_feat.shape[0]
    if query_ids is None:
        query_ids = jnp.arange(Q, dtype=jnp.int32)
    big = jnp.asarray(1 << 20, jnp.int32)
    if Q * n_feats <= 6 * 1024 * 1024:
        # dense masked min/argmin (argmin's first-minimum rule IS the
        # lowest-claimant tie-break)
        feat = jnp.where(res.ok, res.best_feat, -1)
        claims = feat[:, None] == jnp.arange(n_feats,
                                             dtype=jnp.int32)[None, :]
        dmat = jnp.where(claims, res.best_dist[:, None], big)   # [Q, F]
        feat_best = jnp.min(dmat, axis=0)                       # [F]
        qwin = jnp.argmin(dmat, axis=0)
        has = feat_best < big
        frame_assign = jnp.where(has, query_ids[qwin], -1)
        win = res.ok & has[jnp.clip(feat, 0, n_feats - 1)] \
            & (qwin[jnp.clip(feat, 0, n_feats - 1)]
               == jnp.arange(Q, dtype=jnp.int32)) & (feat >= 0)
        return frame_assign, res._replace(
            ok=win, best_feat=jnp.where(win, res.best_feat, -1))
    # large query sets (the local-map call): the dense matrix costs more
    # than the serialized scatters it replaces — keep scatter-min there
    feat = jnp.where(res.ok, res.best_feat, n_feats)
    feat_best = jnp.full((n_feats + 1,), big).at[feat].min(res.best_dist)
    win = res.ok & (res.best_dist <= feat_best[feat])
    feat_winner = jnp.full((n_feats + 1,), jnp.asarray(1 << 30, jnp.int32)
                           ).at[jnp.where(win, feat, n_feats)].min(query_ids)
    win = win & (feat_winner[feat] == query_ids)
    frame_assign = jnp.full((n_feats,), -1, jnp.int32).at[
        jnp.where(win, feat, n_feats)].set(query_ids, mode="drop")
    return frame_assign, res._replace(ok=win,
                                      best_feat=jnp.where(win, res.best_feat,
                                                          -1))


def search_epipolar(kf1_desc, kf1_xy, kf1_level, kf1_mask,
                    kf2_desc, kf2_xy, kf2_level, kf2_mask,
                    F12, scale_factors, th: int = 50,
                    check_orientation=None):
    """Epipolar-constrained matching for triangulation
    (SearchForTriangulation, src/ORBmatcher.cc:659): feature pairs whose
    epipolar distance in image 2 is below 3.84 * sigma^2 of the level.

    F12: fundamental matrix mapping image-1 points to epipolar lines in 2.
    Returns MatchResult over kf1 features (targets are kf2 features).
    """
    ones = jnp.ones_like(kf1_xy[:, :1])
    x1 = jnp.concatenate([kf1_xy, ones], axis=-1)        # [N1, 3]
    lines = x1 @ F12.T                                   # [N1, 3] lines in im2
    # distance of each kf2 point to each kf1 epipolar line
    dist_num = (lines[:, None, 0] * kf2_xy[None, :, 0]
                + lines[:, None, 1] * kf2_xy[None, :, 1]
                + lines[:, None, 2])
    dist_den = jnp.sqrt(lines[:, None, 0] ** 2 + lines[:, None, 1] ** 2 + 1e-12)
    epi_d2 = (dist_num / dist_den) ** 2                  # [N1, N2]
    sigma2 = jnp.asarray(scale_factors, jnp.float32)[kf2_level] ** 2
    cand = (epi_d2 < 3.84 * sigma2[None, :]) & kf1_mask[:, None] & kf2_mask[None, :]

    dmat = hamming.hamming_matrix(kf1_desc, kf2_desc)
    idx, best, _ = hamming.masked_argmin(dmat, cand)
    ok = kf1_mask & (best <= th)
    return MatchResult(jnp.where(ok, idx, -1), best, ok)
