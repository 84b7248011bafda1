"""Pure jitted pipeline steps shared by the tracker and local mapper.

Each function is one phase of the reference pipeline re-expressed as a
fixed-shape array program over MapState (see runtime/__init__ docstring).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..geometry import camera, se3
from ..mapstate import state as ms
from ..ops import matchers
from ..ops.frame import FrameFeatures
from ..optim import ba as ba_mod
from ..optim import pose_opt

NONE = ms.NONE


# ---------------------------------------------------------------------------
# Initialization (stereo / RGB-D)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def stereo_init_step(state: ms.MapState, feats: FrameFeatures, frame_id,
                     agent, map_id, kf_slot, mp_base, cfg: SlamConfig):
    """First-keyframe bootstrap (Tracking::StereoInitialization,
    src/Tracking.cc:520-574): identity pose, a map point for every feature
    with valid depth. Returns (state, frame_mp, n_new_points)."""
    K, F, P, O = state.caps
    q0 = jnp.array([1.0, 0.0, 0.0, 0.0])
    t0 = jnp.zeros(3)

    new = feats.valid & (feats.depth > 0)
    slots = mp_base + jnp.cumsum(new.astype(jnp.int32)) - 1
    slots = jnp.where(new & (slots < P), slots, NONE)
    ok = slots >= 0

    # unproject at identity: pc == pw
    from ..geometry import camera as cam_mod
    pos = cam_mod.backproject(cfg.camera, feats.xy, feats.depth)
    norm = jnp.maximum(jnp.linalg.norm(pos, axis=-1, keepdims=True), 1e-9)
    normal = pos / norm
    sf = jnp.asarray(cfg.orb.scale_factors)
    dist = norm[:, 0]
    max_d = dist * sf[feats.level]
    min_d = max_d / sf[-1]

    state = ms.add_points(state, slots, pos, feats.desc, normal, min_d, max_d,
                          ref_kf=jnp.full((F,), kf_slot, jnp.int32),
                          agent=jnp.full((F,), agent, jnp.int32),
                          map_id=jnp.full((F,), map_id, jnp.int32), valid=ok)
    frame_mp = jnp.where(ok, slots, NONE)
    state = ms.insert_keyframe(state, kf_slot, feats, q0, t0, frame_id, agent,
                               map_id, frame_mp, parent=NONE,
                               fixed_origin=True)
    return state, frame_mp, jnp.sum(ok.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Per-frame tracking
# ---------------------------------------------------------------------------

class TrackResult(NamedTuple):
    q: jnp.ndarray
    t: jnp.ndarray
    frame_mp: jnp.ndarray    # [F] point slot per feature (-1)
    n_inliers: jnp.ndarray


def _pose_obs_from_frame(state, feats, frame_mp, cfg):
    K, F, P, O = state.caps
    mp = jnp.clip(frame_mp, 0, P - 1)
    mask = (frame_mp >= 0) & feats.valid
    pw = state.mp_pos[mp]
    inv_sigma2 = 1.0 / jnp.asarray(cfg.orb.scale_factors)[feats.level] ** 2
    obs = jnp.concatenate([feats.xy, feats.u_right[:, None]], axis=-1)
    return pose_opt.PoseObs(pw=pw, obs=obs, inv_sigma2=inv_sigma2,
                            is_stereo=feats.u_right >= 0, mask=mask)


@functools.partial(jax.jit, static_argnames=("cfg", "radius_mult"))
def track_motion_model_step(state: ms.MapState, feats: FrameFeatures,
                            prev_feats: FrameFeatures, prev_frame_mp,
                            q_pred, t_pred, cfg: SlamConfig,
                            radius_mult: float = 1.0) -> TrackResult:
    """Frame-to-frame tracking (TrackWithMotionModel, src/Tracking.cc:880-941
    + SearchByProjection frame overload src/ORBmatcher.cc:1330):
    project the previous frame's map points with the constant-velocity pose,
    window-match, rotation-consistency filter, pose-only optimize."""
    K, F, P, O = state.caps
    th = 7.0 if cfg.sensor == 1 else 15.0  # reference: 7 stereo, 15 otherwise
    mp = jnp.clip(prev_frame_mp, 0, P - 1)
    qmask = (prev_frame_mp >= 0) & prev_feats.valid & state.mp_valid[mp]
    pw = state.mp_pos[mp]
    uv, ur, depth, vis = matchers.project_points(cfg.camera, q_pred, t_pred, pw)
    sf = jnp.asarray(cfg.orb.scale_factors)
    radius = radius_mult * th * sf[prev_feats.level]
    res = matchers.match_window(feats, prev_feats.desc, qmask & vis, uv,
                                radius, pred_ur=ur,
                                pred_level=prev_feats.level,
                                th=cfg.matcher.th_high)
    res = matchers.rotation_consistency(prev_feats.angle, feats.angle, res,
                                        cfg.matcher.histo_length)
    frame_assign, res = matchers.resolve_conflicts(res, F)
    frame_mp = jnp.where(frame_assign >= 0, prev_frame_mp[jnp.clip(
        frame_assign, 0, F - 1)], NONE)

    obs = _pose_obs_from_frame(state, feats, frame_mp, cfg)
    q, t, inlier, n = pose_opt.pose_optimize(q_pred, t_pred, obs, cfg.camera,
                                             cfg.optimizer)
    frame_mp = jnp.where(inlier, frame_mp, NONE)
    return TrackResult(q, t, frame_mp, n)


class VOTrackResult(NamedTuple):
    q: jnp.ndarray
    t: jnp.ndarray
    frame_mp: jnp.ndarray    # [F] point slot per feature (-1; VO points excluded)
    n_inliers: jnp.ndarray   # all inliers (map + VO)
    n_map_inliers: jnp.ndarray  # inliers tied to real map points (mbVO test)


@functools.partial(jax.jit, static_argnames=("cfg",))
def make_vo_points(state: ms.MapState, feats: FrameFeatures, frame_mp,
                   q, t, cfg: SlamConfig):
    """Localization-mode temporal point creation (UpdateLastFrame,
    src/Tracking.cc:814-878): unproject the previous frame's close stereo/
    RGB-D features that have no map point, closest-first up to 100 beyond
    the close band. Returns ([F,3] world positions, [F] mask)."""
    close_th = cfg.tracking.th_depth * cfg.camera.baseline
    cand = feats.valid & (feats.depth > 0) & (frame_mp < 0)
    # reference: insert sorted by depth; keep all closer than close_th and
    # stop after 100 points once past it
    depth_key = jnp.where(cand, feats.depth, jnp.inf)
    order = jnp.argsort(depth_key)
    rank = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype))
    keep = cand & ((feats.depth < close_th) | (rank < 100))
    pc = camera.backproject(cfg.camera, feats.xy, feats.depth)
    q_wc, t_wc = se3.inverse(q, t)
    pw = se3.apply(q_wc, t_wc, pc)
    return pw, keep


@functools.partial(jax.jit, static_argnames=("cfg", "radius_mult"))
def track_motion_model_vo_step(state: ms.MapState, feats: FrameFeatures,
                               prev_feats: FrameFeatures, prev_frame_mp,
                               vo_pw, vo_mask, q_pred, t_pred,
                               cfg: SlamConfig,
                               radius_mult: float = 1.0) -> VOTrackResult:
    """Localization-only motion-model tracking: like
    track_motion_model_step but the previous frame contributes both its map
    points and the temporal VO points created by make_vo_points
    (Tracking::TrackWithMotionModel in mbOnlyTracking mode,
    src/Tracking.cc:336-403 + :814-878)."""
    K, F, P, O = state.caps
    th = 7.0 if cfg.sensor == 1 else 15.0
    mp = jnp.clip(prev_frame_mp, 0, P - 1)
    has_mp = (prev_frame_mp >= 0) & prev_feats.valid & state.mp_valid[mp]
    use_vo = vo_mask & prev_feats.valid & ~has_mp
    pw = jnp.where(use_vo[:, None], vo_pw, state.mp_pos[mp])
    qmask = has_mp | use_vo
    uv, ur, depth, vis = matchers.project_points(cfg.camera, q_pred, t_pred, pw)
    sf = jnp.asarray(cfg.orb.scale_factors)
    radius = radius_mult * th * sf[prev_feats.level]
    res = matchers.match_window(feats, prev_feats.desc, qmask & vis, uv,
                                radius, pred_ur=ur,
                                pred_level=prev_feats.level,
                                th=cfg.matcher.th_high)
    res = matchers.rotation_consistency(prev_feats.angle, feats.angle, res,
                                        cfg.matcher.histo_length)
    frame_assign, res = matchers.resolve_conflicts(res, F)
    prev_idx = jnp.clip(frame_assign, 0, F - 1)
    matched = frame_assign >= 0
    pw_frame = pw[prev_idx]
    is_map = matched & has_mp[prev_idx]
    frame_mp = jnp.where(is_map, prev_frame_mp[prev_idx], NONE)

    inv_sigma2 = 1.0 / sf[feats.level] ** 2
    obs = pose_opt.PoseObs(
        pw=pw_frame,
        obs=jnp.concatenate([feats.xy, feats.u_right[:, None]], axis=-1),
        inv_sigma2=inv_sigma2, is_stereo=feats.u_right >= 0,
        mask=matched & feats.valid)
    q, t, inlier, n = pose_opt.pose_optimize(q_pred, t_pred, obs, cfg.camera,
                                             cfg.optimizer)
    frame_mp = jnp.where(inlier, frame_mp, NONE)
    n_map = jnp.sum(inlier & is_map)
    return VOTrackResult(q, t, frame_mp, n, n_map)


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_reference_kf_step(state: ms.MapState, feats: FrameFeatures,
                            ref_kf, q_init, t_init, cfg: SlamConfig
                            ) -> TrackResult:
    """Fallback: match against the reference keyframe's map points by
    unconstrained descriptor matching with ratio test (TrackReferenceKeyFrame
    src/Tracking.cc:770-812 + SearchByBoW src/ORBmatcher.cc:161 — see
    matchers.match_brute for why the BoW-node restriction is dropped)."""
    K, F, P, O = state.caps
    kf_desc = state.kf_desc[ref_kf]
    kf_mp = state.kf_mp[ref_kf]
    qmask = (kf_mp >= 0) & state.kf_feat_valid[ref_kf] \
        & state.mp_valid[jnp.clip(kf_mp, 0, P - 1)]
    res = matchers.match_brute(kf_desc, qmask, feats.desc, feats.valid,
                               th=cfg.matcher.th_low,
                               nn_ratio=cfg.matcher.nn_ratio_bow)
    res = matchers.rotation_consistency(state.kf_angle[ref_kf], feats.angle,
                                        res, cfg.matcher.histo_length)
    frame_assign, res = matchers.resolve_conflicts(res, F)
    frame_mp = jnp.where(frame_assign >= 0,
                         kf_mp[jnp.clip(frame_assign, 0, F - 1)], NONE)
    obs = _pose_obs_from_frame(state, feats, frame_mp, cfg)
    q, t, inlier, n = pose_opt.pose_optimize(q_init, t_init, obs, cfg.camera,
                                             cfg.optimizer)
    frame_mp = jnp.where(inlier, frame_mp, NONE)
    return TrackResult(q, t, frame_mp, n)


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_local_map_step(state: ms.MapState, feats: FrameFeatures, q, t,
                         frame_mp, ref_kf, cfg: SlamConfig) -> TrackResult:
    """Local-map tracking (TrackLocalMap src/Tracking.cc:943-987 +
    SearchLocalPoints :1156 + SearchByProjection src/ORBmatcher.cc:45):
    gather the points of the reference KF's covisibility neighborhood,
    project into the frame, window-match by predicted scale & viewing angle,
    then pose-only optimize over all associations."""
    K, F, P, O = state.caps
    LP = cfg.caps.local_points

    # local KFs: covisibility neighbors of ref_kf + ref_kf itself
    neigh = ms.covis_neighbors_mask(state, ref_kf, 1)
    neigh = neigh.at[ref_kf].set(True)
    # local points: observed by any local KF
    obs_of_local = jnp.where(neigh[:, None], state.kf_mp, NONE)  # [K, F]
    local_mask = jnp.zeros((P + 1,), bool).at[
        jnp.where(obs_of_local >= 0, obs_of_local, P).reshape(-1)].set(True)[:P]
    local_mask &= state.mp_valid
    # exclude points already matched in this frame
    already = jnp.zeros((P + 1,), bool).at[
        jnp.where(frame_mp >= 0, frame_mp, P)].set(True)[:P]
    cand_mask = local_mask & ~already

    ids = jnp.nonzero(cand_mask, size=LP, fill_value=P)[0]
    id_ok = ids < P
    ids_c = jnp.clip(ids, 0, P - 1)
    pw = state.mp_pos[ids_c]

    uv, ur, depth, vis = matchers.project_points(cfg.camera, q, t, pw)
    # frustum gates (Frame::isInFrustum include/Frame.h:85): distance band,
    # viewing angle vs normal < 60 deg
    q_wc, t_wc = se3.inverse(q, t)
    view = pw - t_wc
    dist = jnp.linalg.norm(view, axis=-1)
    band_ok = (dist >= 0.8 * state.mp_min_dist[ids_c]) \
        & (dist <= 1.2 * state.mp_max_dist[ids_c])
    view_cos = jnp.sum(view * state.mp_normal[ids_c], axis=-1) \
        / jnp.maximum(dist, 1e-9)
    cos_ok = view_cos > 0.5
    qmask = id_ok & vis & band_ok & cos_ok

    sf = jnp.asarray(cfg.orb.scale_factors)
    pred_level = ms.predict_scale(dist, state.mp_max_dist[ids_c],
                                  cfg.orb.scale_factor, cfg.orb.n_levels)
    radius = jnp.where(view_cos > 0.998, 2.5, 4.0) * sf[pred_level]

    res = matchers.match_window(feats, state.mp_desc[ids_c], qmask, uv,
                                radius, pred_ur=ur, pred_level=pred_level,
                                th=cfg.matcher.th_high,
                                nn_ratio=cfg.matcher.nn_ratio_tracking)
    frame_assign, res = matchers.resolve_conflicts(res, F)
    # merge: keep existing associations, add new ones where free
    new_mp = jnp.where(frame_assign >= 0,
                       ids[jnp.clip(frame_assign, 0, F - 1)], NONE)
    frame_mp = jnp.where(frame_mp >= 0, frame_mp, new_mp)

    obs = _pose_obs_from_frame(state, feats, frame_mp, cfg)
    q2, t2, inlier, n = pose_opt.pose_optimize(q, t, obs, cfg.camera,
                                               cfg.optimizer)
    frame_mp = jnp.where(inlier, frame_mp, NONE)

    # visibility / found counters (IncreaseVisible/IncreaseFound)
    vis_ids = jnp.where(qmask, ids, P)
    mp_visible = state.mp_visible.at[vis_ids].add(1.0, mode="drop")
    found_ids = jnp.where(frame_mp >= 0, frame_mp, P)
    mp_found = state.mp_found.at[found_ids].add(1.0, mode="drop")
    # (counter updates returned via new state)
    new_state = state._replace(mp_visible=mp_visible, mp_found=mp_found)
    return TrackResult(q2, t2, frame_mp, n), new_state


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_frame_step(state: ms.MapState, feats: FrameFeatures,
                     prev_feats: FrameFeatures, prev_frame_mp, ref_kf,
                     last_q, last_t, vel_q, vel_t, has_velocity,
                     use_min_obs_gate, cfg: SlamConfig):
    """One-dispatch tracking cascade: constant-velocity pose prediction ->
    motion model -> wide-window retry -> reference-KF fallback -> local-map
    tracking (Track(), src/Tracking.cc:318-327 + :943-987), with every
    small-scalar decision the host needs packed into ONE output vector.

    The host state machine previously issued 3-5 blocking int() device
    reads per frame (one per cascade stage); on TPU each read costs a full
    dispatch round trip. Here the cascade runs under lax.cond inside one
    jitted program and the host fetches a single [5] decision vector:
    [ok, n_inliers, tracked_close, untracked_close, ref_kf_matches].
    The velocity update (src/Tracking.cc:435-443) also happens here so the
    host never issues eager SE3 arithmetic on the frame path; outputs
    (q_pred, t_pred, new velocity) stay on device.
    """
    tcfg = cfg.tracking
    q_pred, t_pred = se3.compose(vel_q, vel_t, last_q, last_t)
    q_pred = jnp.where(has_velocity, q_pred, last_q)
    t_pred = jnp.where(has_velocity, t_pred, last_t)
    tr1 = track_motion_model_step(state, feats, prev_feats, prev_frame_mp,
                                  q_pred, t_pred, cfg)

    def wide(_):
        return track_motion_model_step(state, feats, prev_feats,
                                       prev_frame_mp, q_pred, t_pred, cfg,
                                       radius_mult=2.0)

    tr = jax.lax.cond(tr1.n_inliers < tcfg.min_matches_motion_model,
                      wide, lambda _: tr1, None)

    def refkf(_):
        return track_reference_kf_step(state, feats, ref_kf, q_pred, t_pred,
                                       cfg)

    tr = jax.lax.cond(tr.n_inliers < tcfg.min_matches_ref_kf,
                      refkf, lambda _: tr, None)
    ok1 = tr.n_inliers >= 10

    def local_map(_):
        return track_local_map_step(state, feats, tr.q, tr.t, tr.frame_mp,
                                    ref_kf, cfg)

    tr2, new_state = jax.lax.cond(ok1, local_map,
                                  lambda _: (tr, state), None)
    ok = ok1 & (tr2.n_inliers >= tcfg.min_inliers_track_local_map)
    out = TrackResult(
        q=jnp.where(ok, tr2.q, tr.q), t=jnp.where(ok, tr2.t, tr.t),
        frame_mp=jnp.where(ok, tr2.frame_mp, tr.frame_mp),
        n_inliers=jnp.where(ok, tr2.n_inliers, tr.n_inliers))

    # keyframe-decision counters (NeedNewKeyFrame, src/Tracking.cc:1016-1029)
    close_th = tcfg.th_depth * cfg.camera.baseline
    tracked = out.frame_mp >= 0
    close = feats.valid & (feats.depth > 0) & (feats.depth < close_th)
    tracked_close = jnp.sum(close & tracked)
    untracked_close = jnp.sum(close & ~tracked)

    # reference-KF tracked count (min obs 3 once the map has > 2 KFs)
    K, F, P, O = state.caps
    kf_mp = state.kf_mp[ref_kf]
    kvalid = kf_mp >= 0
    n_obs = state.mp_n_obs()[jnp.clip(kf_mp, 0, P - 1)]
    ref_matches = jnp.where(
        use_min_obs_gate, jnp.sum(kvalid & (n_obs >= 3)), jnp.sum(kvalid))

    decision = jnp.stack([ok.astype(jnp.int32), out.n_inliers,
                          tracked_close, untracked_close, ref_matches])

    # velocity update (Tcw_cur * Twc_last) for the next frame's prediction
    new_vel_q, new_vel_t = se3.relative(out.q, out.t, last_q, last_t)
    return out, new_state, decision, (q_pred, t_pred, new_vel_q, new_vel_t)


# ---------------------------------------------------------------------------
# Keyframe creation
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def create_keyframe_step(state: ms.MapState, feats: FrameFeatures, q, t,
                         frame_mp, frame_id, agent, map_id, kf_slot, mp_base,
                         cfg: SlamConfig):
    """Insert a keyframe + spawn stereo map points for close unmatched
    features (CreateNewKeyFrame src/Tracking.cc:1076-1154: sorted by depth,
    all closer than ThDepth, at least the closest 100). Standalone jit of
    the pipeline's first stage (tests; relocalization re-entry)."""
    return _create_keyframe_core(state, feats, q, t, frame_mp, frame_id,
                                 agent, map_id, kf_slot, mp_base, cfg)


# ---------------------------------------------------------------------------
# Local bundle adjustment over the covisibility window
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "n_iters1", "n_iters2"))
def local_ba_step(state: ms.MapState, center_kf, cfg: SlamConfig,
                  n_iters1: int = 5, n_iters2: int = 10):
    """Local BA (LocalBundleAdjustment src/Optimizer.cc:455-783): optimize
    the 1-ring covisibility window of center_kf and all points they observe;
    other observing KFs participate as fixed; origin KFs always fixed.
    Two stages with chi2 outlier erasure in between, as the reference does.
    """
    K, F, P, O = state.caps
    window = ms.covis_neighbors_mask(state, center_kf, 1)
    window = window.at[center_kf].set(True)
    window &= state.kf_valid

    # points observed by window KFs
    obs_sel = jnp.where(window[:, None], state.kf_mp, NONE)
    point_mask = jnp.zeros((P + 1,), bool).at[
        jnp.where(obs_sel >= 0, obs_sel, P).reshape(-1)].set(True)[:P]
    point_mask &= state.mp_valid

    # fixed poses: valid KFs outside the window that observe selected points,
    # plus origin anchors; invalid KFs excluded entirely
    fixed = (state.kf_valid & ~window) | state.kf_fixed_origin

    obs_kf = state.mp_obs_kf
    obs_feat = jnp.clip(state.mp_obs_feat, 0, F - 1)
    kf_c = jnp.clip(obs_kf, 0, K - 1)
    uv = state.kf_xy[kf_c, obs_feat]
    ur = state.kf_right[kf_c, obs_feat]
    level = state.kf_level[kf_c, obs_feat]
    sf = jnp.asarray(cfg.orb.scale_factors)
    inv_sigma2 = 1.0 / sf[level] ** 2
    obs_mask = (obs_kf >= 0) & point_mask[:, None] \
        & state.kf_valid[kf_c]

    prob = ba_mod.BAProblem(
        q=state.kf_q, t=state.kf_t,
        pose_valid=state.kf_valid,
        pose_fixed=fixed,
        pw=state.mp_pos,
        point_valid=point_mask,
        obs_kf=jnp.where(obs_mask, obs_kf, NONE),
        obs_uvr=jnp.concatenate([uv, ur[..., None]], axis=-1),
        obs_inv_sigma2=inv_sigma2,
        obs_stereo=ur >= 0,
        obs_mask=obs_mask,
    )
    res = ba_mod.ba_solve_fast(prob, cfg.camera, n_iters=n_iters1,
                               use_huber=True, chunk=_ba_chunk(P))
    keep = ba_mod.outlier_mask(res, prob)
    prob2 = prob._replace(q=res.q, t=res.t, pw=res.pw, obs_mask=keep)
    res2 = ba_mod.ba_solve_fast(prob2, cfg.camera, n_iters=n_iters2,
                                use_huber=False, chunk=_ba_chunk(P))
    keep2 = ba_mod.outlier_mask(res2, prob2)

    # write back optimized poses/points
    state = state._replace(
        kf_q=jnp.where((window & ~fixed)[:, None], res2.q, state.kf_q),
        kf_t=jnp.where((window & ~fixed)[:, None], res2.t, state.kf_t),
        mp_pos=jnp.where(point_mask[:, None], res2.pw, state.mp_pos),
    )
    # erase outlier observations (reference erases chi2>th obs pairs,
    # src/Optimizer.cc:750-762)
    erase = prob.obs_mask & ~keep2
    state = erase_observations(state, erase)
    return state


def _ba_chunk(P: int) -> int:
    return max(min(P, 2048), P // 32)


def erase_observations(state: ms.MapState, erase_mask):
    """Remove observations flagged in erase_mask [P, O] from both directions
    (MapPoint::EraseObservation + KeyFrame::EraseMapPointMatch)."""
    K, F, P, O = state.caps
    kf = jnp.where(erase_mask, state.mp_obs_kf, K)   # K/F rows out of bounds
    ft = jnp.where(erase_mask, state.mp_obs_feat, F)  # -> dropped by mode=drop
    kf_mp = state.kf_mp.at[kf.reshape(-1), ft.reshape(-1)].set(NONE, mode="drop")
    return state._replace(
        kf_mp=kf_mp,
        mp_obs_kf=jnp.where(erase_mask, NONE, state.mp_obs_kf),
        mp_obs_feat=jnp.where(erase_mask, NONE, state.mp_obs_feat),
    )


@functools.partial(jax.jit)
def recompute_covisibility(state: ms.MapState):
    """Full covisibility rebuild from the inverse observation lists:
    every pair of KFs observing the same point adds weight 1
    (batch equivalent of calling UpdateConnections on every KF)."""
    K, F, P, O = state.caps
    obs = state.mp_obs_kf                        # [P, O]
    a = jnp.where(obs[:, :, None] >= 0, obs[:, :, None], K)
    b = jnp.where(obs[:, None, :] >= 0, obs[:, None, :], K)
    idx = jnp.where((a < K) & (b < K) & (a != b), a * K + b, K * K)

    def body(carry, idx_chunk):
        return carry + jax.ops.segment_sum(
            jnp.ones_like(idx_chunk.reshape(-1)), idx_chunk.reshape(-1),
            num_segments=K * K + 1)[:K * K], None

    n_chunks = max(P // 2048, 1)
    idx_c = idx.reshape(n_chunks, -1, O, O)
    covis, _ = jax.lax.scan(body, jnp.zeros(K * K, jnp.int32), idx_c)
    return state._replace(covis=covis.reshape(K, K))


# ---------------------------------------------------------------------------
# Triangulation of new map points (LocalMapping::CreateNewMapPoints)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def triangulate_pair_step(state: ms.MapState, kf1, kf2, mp_base,
                          cfg: SlamConfig):
    """Triangulate new points between two keyframes (reference
    src/LocalMapping.cc:213-458 + SearchForTriangulation
    src/ORBmatcher.cc:659): epipolar-constrained matching of features that
    have no map point yet, batched DLT triangulation, parallax / depth /
    reprojection / scale gates, then registration in both keyframes.

    Returns (state, n_new). Slots allocated from mp_base.
    """
    state, n_new = _triangulate_pair_core(state, kf1, kf2, mp_base, cfg,
                                          jnp.asarray(True))
    state = ms.update_covisibility(state, kf1)
    state = ms.update_covisibility(state, kf2)
    return state, n_new


def _triangulate_pair_core(state: ms.MapState, kf1, kf2, mp_base,
                           cfg: SlamConfig, enable):
    """Triangulation body without the covisibility refresh — reused by the
    fused keyframe pipeline, which recomputes covisibility once after all
    neighbor pairs. `enable=False` turns the whole call into a no-op (for
    masked lax.scan iterations over a fixed neighbor budget)."""
    from ..geometry.twoview import triangulate_batch
    K, F, P, O = state.caps
    cam = cfg.camera

    q1, t1 = state.kf_q[kf1], state.kf_t[kf1]
    q2, t2 = state.kf_q[kf2], state.kf_t[kf2]

    # fundamental matrix F12: x2^T F12 x1 = 0 -> lines in image 2
    q12, t12 = se3.relative(q2, t2, q1, t1)      # T_2<-1
    R12 = se3.quat_to_matrix(q12)
    E12 = se3.hat(t12) @ R12
    Kmat = cam.K
    Kinv = jnp.linalg.inv(Kmat)
    F12 = Kinv.T @ E12 @ Kinv

    free1 = state.kf_feat_valid[kf1] & (state.kf_mp[kf1] < 0)
    free2 = state.kf_feat_valid[kf2] & (state.kf_mp[kf2] < 0)

    res = matchers.search_epipolar(
        state.kf_desc[kf1], state.kf_xy[kf1], state.kf_level[kf1], free1,
        state.kf_desc[kf2], state.kf_xy[kf2], state.kf_level[kf2], free2,
        F12, cfg.orb.scale_factors, th=cfg.matcher.th_low)
    frame_assign, res = matchers.resolve_conflicts(res, F)
    ok = res.ok
    f2 = jnp.clip(res.best_feat, 0, F - 1)

    # triangulate in world frame with projective camera matrices
    T1 = jnp.concatenate([se3.quat_to_matrix(q1), t1[:, None]], -1)
    T2 = jnp.concatenate([se3.quat_to_matrix(q2), t2[:, None]], -1)
    P1 = Kmat @ T1
    P2 = Kmat @ T2
    x1 = state.kf_xy[kf1]
    x2 = state.kf_xy[kf2][f2]
    pw_dlt = triangulate_batch(P1, P2, x1, x2)           # [F, 3]

    # stereo-aware source selection (reference :294-358): when the bearing
    # rays' parallax is weaker than the stereo rig's own parallax at the
    # observed depth, unproject that keyframe's stereo depth instead of the
    # DLT point. Parallax comes from the PRE-triangulation bearing rays
    # (reference :296-305), so a degenerate DLT solution can't feed a bogus
    # parallax into the gate; and cosParallaxStereo2 is only computed when
    # keyframe 1 has no stereo depth (the reference's else-if :317-321 —
    # with both stereo, KF1's stereo parallax alone gates the DLT and the
    # depth fallback always unprojects from KF1).
    q1i, c1 = se3.inverse(q1, t1)
    q2i, c2 = se3.inverse(q2, t2)
    Kinv_ = Kinv
    ray1 = se3.quat_rotate(q1i, (Kinv_ @ jnp.concatenate(
        [x1, jnp.ones((x1.shape[0], 1))], -1).T).T)
    ray2 = se3.quat_rotate(q2i, (Kinv_ @ jnp.concatenate(
        [x2, jnp.ones((x2.shape[0], 1))], -1).T).T)
    cosp = jnp.sum(ray1 * ray2, -1) / jnp.maximum(
        jnp.linalg.norm(ray1, axis=-1) * jnp.linalg.norm(ray2, axis=-1), 1e-9)

    depth1 = state.kf_depth[kf1]                         # [F]
    depth2 = state.kf_depth[kf2][f2]
    has_st1 = depth1 > 0
    has_st2 = depth2 > 0
    b = cam.baseline
    no_st = cosp + 1.0   # reference init: cosParallaxRays + 1 (:315-316)
    cos_st1 = jnp.where(has_st1,
                        jnp.cos(2.0 * jnp.arctan2(b / 2.0,
                                                  jnp.maximum(depth1, 1e-6))),
                        no_st)
    cos_st2 = jnp.where(~has_st1 & has_st2,
                        jnp.cos(2.0 * jnp.arctan2(b / 2.0,
                                                  jnp.maximum(depth2, 1e-6))),
                        no_st)
    cos_st = jnp.minimum(cos_st1, cos_st2)
    use_dlt = (cosp < cos_st) & (cosp > 0) \
        & (has_st1 | has_st2 | (cosp < 0.9998))

    from ..geometry import camera as cam_mod
    pw_st1 = se3.apply(q1i, c1, cam_mod.backproject(cam, x1, depth1))
    pw_st2 = se3.apply(q2i, c2, cam_mod.backproject(cam, x2, depth2))
    use_st1 = ~use_dlt & has_st1 & (cos_st1 < cos_st2)
    use_st2 = ~use_dlt & ~use_st1 & has_st2 & (cos_st2 < cos_st1)
    pw = jnp.where(use_st1[:, None], pw_st1,
                   jnp.where(use_st2[:, None], pw_st2, pw_dlt))
    source_ok = use_dlt | use_st1 | use_st2

    # gates (reference :359-437)
    pc1 = se3.apply(q1, t1, pw)
    pc2 = se3.apply(q2, t2, pw)
    z_ok = (pc1[:, 2] > 0.05) & (pc2[:, 2] > 0.05)

    sf = jnp.asarray(cfg.orb.scale_factors)

    def reproj_err2(pc, x, ur_obs, level):
        """chi2-normalized reprojection error; stereo rows (ur_obs >= 0)
        include the right-image residual (reference :371-407)."""
        z = jnp.maximum(pc[:, 2], 1e-6)
        u = cam.fx * pc[:, 0] / z + cam.cx
        v = cam.fy * pc[:, 1] / z + cam.cy
        e2 = (u - x[:, 0]) ** 2 + (v - x[:, 1]) ** 2
        is_st = ur_obs >= 0
        ur = u - cam.bf / z
        e2 = e2 + jnp.where(is_st, (ur - ur_obs) ** 2, 0.0)
        sigma2 = sf[level] ** 2
        th = jnp.where(is_st, 7.8, 5.991)
        return e2 / sigma2, th

    e1, th1 = reproj_err2(pc1, x1, state.kf_right[kf1], state.kf_level[kf1])
    e2, th2 = reproj_err2(pc2, x2, state.kf_right[kf2][f2],
                          state.kf_level[kf2][f2])
    reproj_ok = (e1 < th1) & (e2 < th2)

    # scale consistency (reference ratioDist vs ratioOctave :416-437)
    r1 = pw - c1
    r2 = pw - c2
    d1 = jnp.linalg.norm(r1, axis=-1)
    d2 = jnp.linalg.norm(r2, axis=-1)
    ratio_d = d2 / jnp.maximum(d1, 1e-9)
    ratio_o = sf[state.kf_level[kf1]] / sf[state.kf_level[kf2][f2]]
    scale_ok = (ratio_d < ratio_o * 1.5 * cfg.orb.scale_factor) \
        & (ratio_d * 1.5 * cfg.orb.scale_factor > ratio_o)

    new = ok & source_ok & z_ok & reproj_ok & scale_ok & enable
    slots = mp_base + jnp.cumsum(new.astype(jnp.int32)) - 1
    slots = jnp.where(new & (slots < P), slots, NONE)
    okslot = slots >= 0

    # point attributes from the kf1 observation
    v = pw - c1
    dist = jnp.maximum(jnp.linalg.norm(v, axis=-1), 1e-9)
    normal = v / dist[:, None]
    max_d = dist * sf[state.kf_level[kf1]]
    min_d = max_d / sf[-1]
    state = ms.add_points(state, slots, pw, state.kf_desc[kf1], normal,
                          min_d, max_d,
                          ref_kf=jnp.full((F,), kf1, jnp.int32),
                          agent=jnp.full((F,), state.kf_agent[kf1], jnp.int32),
                          map_id=jnp.full((F,), state.kf_map[kf1], jnp.int32),
                          valid=okslot)
    feat_idx = jnp.arange(F, dtype=jnp.int32)
    state = ms.add_observations(state, kf1, feat_idx,
                                jnp.where(okslot, slots, NONE), okslot)
    state = ms.add_observations(state, kf2, f2,
                                jnp.where(okslot, slots, NONE), okslot)
    return state, jnp.sum(okslot.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Fused keyframe pipeline (KF insert + triangulation + local mapping + BA +
# culling in ONE dispatch)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "run_local_ba"))
def keyframe_pipeline_step(state: ms.MapState, feats: FrameFeatures, q, t,
                           frame_mp, frame_id, agent, map_id, kf_slot,
                           mp_base, cfg: SlamConfig, run_local_ba: bool):
    """Everything that happens when a keyframe is spawned, as one program:

      CreateNewKeyFrame -> CreateNewMapPoints over the top covisible
      neighbors -> MapPointCulling -> SearchInNeighbors (Fuse both
      directions) -> LocalBundleAdjustment -> KeyFrameCulling
      (reference call stack SURVEY.md §3.3, src/LocalMapping.cc:53-118).

    The previous host orchestration dispatched ~30 separate device programs
    with ~15 blocking scalar reads per keyframe — at a ~25 ms tunnel round
    trip that alone cost ~1.5 s/KF (VERDICT r4 weak #5). Here the host gets
    exactly two fetches: a packed stats vector and the cull report.

    Keyframe-culling semantics differ from the reference in one documented
    way: the reference erases redundant keyframes one at a time, recomputing
    redundancy in between (src/LocalMapping.cc:636-706); this computes
    redundancy for all candidates from the same post-BA state and erases up
    to 3 at once.

    Returns (state, frame_mp [F], q_kf, t_kf, n_new_points,
             cull_vec [3, 9] float32 rows (slot, parent, rel_q(4), rel_t(3)),
             slot/parent = -1 when unused).
    """
    K, F, P, O = state.caps
    mono = cfg.sensor == 0

    # 1. keyframe insertion + close stereo/RGB-D point creation
    state, frame_mp2, n_created = _create_keyframe_core(
        state, feats, q, t, frame_mp, frame_id, agent, map_id, kf_slot,
        mp_base, cfg)
    cursor = mp_base + n_created

    # 2. triangulation neighbors: top covisible, baseline-gated for stereo
    # (src/LocalMapping.cc:221, :255-261)
    nn = (2 * cfg.mapping.triangulation_neighbors if mono
          else cfg.mapping.triangulation_neighbors)
    row = state.covis[kf_slot].at[kf_slot].set(0)
    top_w, top_i = jax.lax.top_k(row, min(nn, K))
    pair_ok = top_w > 0
    if not mono:
        _, c1 = se3.inverse(q, t)
        qn, tn = state.kf_q[top_i], state.kf_t[top_i]
        _, cn = se3.inverse(qn, tn)
        pair_ok &= jnp.linalg.norm(cn - c1[None, :], axis=-1) \
            >= cfg.camera.baseline

    def tri_body(carry, x):
        st, cur = carry
        nkf, okp = x
        st, n_tri = _triangulate_pair_core(st, kf_slot, nkf, cur, cfg, okp)
        return (st, cur + n_tri), n_tri

    (state, cursor), _ = jax.lax.scan(tri_body, (state, cursor),
                                      (top_i, pair_ok))

    # 3. local-mapping hygiene (mapping.local_mapping_pass, fused)
    from . import mapping
    state = mapping.cull_points_step(state, kf_slot, cfg)

    fuse_ok = top_w > 0

    def fuse_body(st, x):
        nkf, okp = x
        own = st.kf_mp[kf_slot]
        own_ids = jnp.where(own >= 0, own, P)
        st = mapping.fuse_into_kf(st, own_ids, nkf, cfg, enable=okp)
        return st, 0

    state, _ = jax.lax.scan(fuse_body, state, (top_i, fuse_ok))

    # direction 2: neighbors' points into the new KF
    cand = jnp.where(fuse_ok[:, None], state.kf_mp[top_i], NONE)  # [NB, F]
    cand_mask = jnp.zeros((P + 1,), bool).at[
        jnp.where(cand >= 0, cand, P).reshape(-1)].set(True)[:P]
    cand_mask &= state.mp_valid
    ids = jnp.nonzero(cand_mask, size=cfg.caps.local_points, fill_value=P)[0]
    state = mapping.fuse_into_kf(state, ids, kf_slot, cfg)

    state = mapping.rebuild_observations(state)
    state = recompute_covisibility(state)
    own = state.kf_mp[kf_slot]
    touched = jnp.zeros((P + 1,), bool).at[
        jnp.where(own >= 0, own, P)].set(True)[:P]
    state = ms.update_point_descriptors(state, touched)
    state = ms.update_point_normals(state, touched, cfg.orb.scale_factor,
                                    cfg.orb.n_levels)

    # 4. local BA + keyframe culling
    cull_vec = jnp.full((3, 9), -1.0, jnp.float32)
    if run_local_ba:
        state = local_ba_step(state, kf_slot, cfg)
        state = recompute_covisibility(state)
        state, cull_vec = _kf_culling_core(state, kf_slot, cfg)
        state = mapping.rebuild_observations(state)
        state = recompute_covisibility(state)

    frame_mp_row = state.kf_mp[kf_slot]
    n_new = (cursor - mp_base).astype(jnp.int32)
    return (state, frame_mp_row, state.kf_q[kf_slot], state.kf_t[kf_slot],
            n_new, cull_vec)


def _create_keyframe_core(state, feats, q, t, frame_mp, frame_id, agent,
                          map_id, kf_slot, mp_base, cfg):
    """Body of create_keyframe_step (kept callable from inside the fused
    pipeline)."""
    K, F, P, O = state.caps
    close = feats.valid & (feats.depth > 0) & (frame_mp < 0)
    depth_ok = feats.depth < cfg.tracking.th_depth * cfg.camera.baseline
    order = jnp.argsort(jnp.where(close, feats.depth, jnp.inf))
    rank = jnp.zeros(F, jnp.int32).at[order].set(jnp.arange(F, dtype=jnp.int32))
    new = close & (depth_ok | (rank < 100))

    slots = mp_base + jnp.cumsum(new.astype(jnp.int32)) - 1
    slots = jnp.where(new & (slots < P), slots, NONE)
    ok = slots >= 0

    from ..geometry import camera as cam_mod
    pw = cam_mod.unproject_world(cfg.camera, q, t, feats.xy, feats.depth)
    q_wc, t_wc = se3.inverse(q, t)
    v = pw - t_wc
    dist = jnp.maximum(jnp.linalg.norm(v, axis=-1), 1e-9)
    normal = v / dist[:, None]
    sf = jnp.asarray(cfg.orb.scale_factors)
    max_d = dist * sf[feats.level]
    min_d = max_d / sf[-1]

    state = ms.add_points(state, slots, pw, feats.desc, normal, min_d, max_d,
                          ref_kf=jnp.full((F,), kf_slot, jnp.int32),
                          agent=jnp.full((F,), agent, jnp.int32),
                          map_id=jnp.full((F,), map_id, jnp.int32), valid=ok)
    frame_mp2 = jnp.where(ok, slots, frame_mp)

    state = ms.insert_keyframe(state, kf_slot, feats, q, t, frame_id, agent,
                               map_id, frame_mp2, parent=NONE)
    parent = jnp.argmax(state.covis[kf_slot].at[kf_slot].set(0))
    has_parent = state.covis[kf_slot, parent] > 0
    state = state._replace(kf_parent=state.kf_parent.at[kf_slot].set(
        jnp.where(has_parent, parent, NONE).astype(jnp.int32)))

    touched = jnp.zeros((P + 1,), bool).at[
        jnp.where(frame_mp2 >= 0, frame_mp2, P)].set(True)[:P]
    state = ms.update_point_descriptors(state, touched)
    state = ms.update_point_normals(state, touched, cfg.orb.scale_factor,
                                    cfg.orb.n_levels)
    return state, frame_mp2, jnp.sum(ok.astype(jnp.int32))


def _kf_culling_core(state, center_kf, cfg, max_cull: int = 3,
                     n_cand: int = 10):
    """KeyFrameCulling (src/LocalMapping.cc:636-706) in one program: rank
    the center's covisible neighbors by weight, compute the 90%-redundancy
    ratio for the top n_cand, erase up to max_cull passing candidates, and
    report (slot, parent, rel pose) rows for trajectory re-chaining."""
    from . import mapping
    K, F, P, O = state.caps
    row = state.covis[center_kf].at[center_kf].set(0)
    top_w, top_i = jax.lax.top_k(row, min(n_cand, K))
    cand_ok = (top_w > 0) & state.kf_valid[top_i] \
        & ~state.kf_fixed_origin[top_i]

    def redundancy(k):
        return mapping.kf_redundancy(state, k, cfg)

    ratio, n_tracked = jax.vmap(redundancy)(top_i)
    elig = cand_ok & (ratio > cfg.mapping.kf_cull_redundancy) \
        & (n_tracked > 20)
    rank = jnp.cumsum(elig.astype(jnp.int32))
    cull = elig & (rank <= max_cull)

    # cull report: relative pose to the spanning-tree parent (mTcp)
    parent = state.kf_parent[top_i]
    par_c = jnp.clip(parent, 0, K - 1)
    rel_q, rel_t = se3.relative(state.kf_q[top_i], state.kf_t[top_i],
                                state.kf_q[par_c], state.kf_t[par_c])
    sel = jnp.nonzero(cull, size=max_cull, fill_value=len(cull))[0]
    sel_c = jnp.clip(sel, 0, len(cull) - 1)
    used = sel < len(cull)
    slot_out = jnp.where(used, top_i[sel_c], -1)
    cull_vec = jnp.concatenate([
        slot_out[:, None].astype(jnp.float32),
        jnp.where(used, parent[sel_c], -1)[:, None].astype(jnp.float32),
        rel_q[sel_c] * used[:, None],
        rel_t[sel_c] * used[:, None]], axis=-1)       # [max_cull, 9]

    def erase_body(st, x):
        slot, ok = x
        st = mapping.erase_keyframe_step(
            st, jnp.where(ok, slot, K))   # K = out of bounds -> no-op
        return st, 0

    state, _ = jax.lax.scan(erase_body, state, (slot_out, used))
    return state, cull_vec


# ---------------------------------------------------------------------------
# Monocular initialization (Tracking::CreateInitialMapMonocular)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def mono_init_map_step(state: ms.MapState, ref_feats: FrameFeatures,
                       cur_feats: FrameFeatures, q2, t2, points, tri_ok,
                       ref_feat_idx, cur_feat_idx, frame_id0, frame_id1,
                       agent, map_id, kf_slot0, kf_slot1, mp_base,
                       cfg: SlamConfig):
    """Build the initial monocular map from a verified two-view
    reconstruction (reference CreateInitialMapMonocular,
    src/Tracking.cc:650-750): two keyframes, triangulated points, and
    median-depth normalization so the map starts at unit scale.

    points: [N, 3] in the reference (first) camera frame == world frame.
    tri_ok: [N] bool; ref/cur_feat_idx: [N] feature indices in each frame.
    Returns (state, frame_mp_cur, scale, n_points).
    """
    K, F, P, O = state.caps
    # median depth normalization (src/Tracking.cc:702-726)
    z = jnp.where(tri_ok, points[:, 2], jnp.nan)
    med = jnp.nanmedian(z)
    scale = 1.0 / jnp.maximum(med, 1e-6)
    pts = points * scale
    t2s = t2 * scale

    q1 = jnp.array([1.0, 0.0, 0.0, 0.0])
    t1 = jnp.zeros(3)

    n = points.shape[0]
    slots = mp_base + jnp.cumsum(tri_ok.astype(jnp.int32)) - 1
    slots = jnp.where(tri_ok & (slots < P), slots, NONE)
    okslot = slots >= 0

    ref_i = jnp.clip(ref_feat_idx, 0, F - 1)
    desc = ref_feats.desc[ref_i]
    dist = jnp.maximum(jnp.linalg.norm(pts, axis=-1), 1e-9)
    normal = pts / dist[:, None]
    sf = jnp.asarray(cfg.orb.scale_factors)
    level = ref_feats.level[ref_i]
    max_d = dist * sf[level]
    min_d = max_d / sf[-1]
    state = ms.add_points(state, slots, pts, desc, normal, min_d, max_d,
                          ref_kf=jnp.full((n,), kf_slot0, jnp.int32),
                          agent=jnp.full((n,), agent, jnp.int32),
                          map_id=jnp.full((n,), map_id, jnp.int32),
                          valid=okslot)

    # frame->point assignments for both keyframes
    fm0 = jnp.full((F,), NONE, jnp.int32).at[
        jnp.where(okslot, ref_i, F)].set(jnp.where(okslot, slots, NONE),
                                         mode="drop")
    cur_i = jnp.clip(cur_feat_idx, 0, F - 1)
    fm1 = jnp.full((F,), NONE, jnp.int32).at[
        jnp.where(okslot, cur_i, F)].set(jnp.where(okslot, slots, NONE),
                                         mode="drop")

    state = ms.insert_keyframe(state, kf_slot0, ref_feats, q1, t1, frame_id0,
                               agent, map_id, fm0, parent=NONE,
                               fixed_origin=True)
    state = ms.insert_keyframe(state, kf_slot1, cur_feats, q2, t2s, frame_id1,
                               agent, map_id, fm1, parent=kf_slot0)
    return state, fm1, scale, jnp.sum(okslot.astype(jnp.int32))
