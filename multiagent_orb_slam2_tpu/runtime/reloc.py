"""Relocalization: recover a lost tracker from the keyframe database.

Replaces Tracking::Relocalization (reference src/Tracking.cc:1359-1520):
BoW candidate query -> per-candidate brute descriptor matching -> EPnP
RANSAC -> robust pose optimization -> up to two projection match-growth
rounds -> accept at >= 50 inliers.

Shared by the single-agent System facade and the multi-agent server path
(the reference runs this inside every agent's Tracking thread; the fork's
split agents rely on it to survive hard trajectory segments). In the
multi-agent shared-state design the candidate set is scoped to the
tracker's CURRENT map: relocalizing into another agent's not-yet-fused map
would silently alias two world frames that only a verified Sim3 fusion may
relate (the reference gets this for free — each agent queries its own
KeyFrameDatabase until fusion swaps in the shared one,
src/MapFusion.cc:706-715).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..geometry import epnp
from ..mapstate import state as ms
from ..ops import matchers
from ..optim import pose_opt
from ..vocab import bow as bow_mod
from ..vocab import kfdb as kfdb_mod
from .tracker import Tracker, TrackerState


def relocalize(tracker: Tracker, db: kfdb_mod.KFDatabase,
               vocab: bow_mod.Vocabulary, feats, cfg: SlamConfig,
               map_id: int = None) -> bool:
    """Attempt to relocalize `tracker` on frame features `feats`.

    map_id: restrict candidate keyframes to this map (None = all maps).
    On success the tracker is switched back to OK with the recovered pose,
    reference keyframe and frame->point associations; its latest trajectory
    record is rewritten in place. Returns True on success.
    """
    sh = tracker.shared
    st = sh.state
    words = bow_mod.transform_words(vocab, feats.desc, feats.valid)
    vec = bow_mod.bow_vector(vocab, words, feats.valid)
    cand_mask, scores = kfdb_mod.detect_reloc_candidates(
        db, words, feats.valid, vec, st.covis)
    cand_mask = np.array(cand_mask)   # writable host copy
    if map_id is not None:
        cand_mask &= np.asarray(st.kf_map) == map_id
    cands = np.nonzero(cand_mask)[0]
    order = np.argsort(-np.asarray(scores)[cands])
    P = st.mp_pos.shape[0]
    sf = jnp.asarray(cfg.orb.scale_factors)
    for c in cands[order][:5]:
        c = int(c)
        kf_mp = st.kf_mp[c]
        qmask = (kf_mp >= 0) & st.kf_feat_valid[c] \
            & st.mp_valid[jnp.clip(kf_mp, 0, P - 1)]
        res = matchers.match_brute(st.kf_desc[c], qmask, feats.desc,
                                   feats.valid, th=cfg.matcher.th_low,
                                   nn_ratio=0.75)
        if int(jnp.sum(res.ok)) < 15:
            continue
        sel = res.ok
        mp = jnp.clip(kf_mp, 0, P - 1)
        pw = st.mp_pos[mp]
        feat = jnp.clip(res.best_feat, 0, feats.xy.shape[0] - 1)
        uv = feats.xy[feat]
        sigma2 = sf[feats.level[feat]] ** 2
        rr = epnp.epnp_ransac(pw, uv, sigma2, sel, cfg.camera,
                              jax.random.PRNGKey(c), n_iters=200)
        if not bool(rr.ok):
            continue
        # polish with robust pose optimization over the matches
        obs = pose_opt.PoseObs(
            pw=pw,
            obs=jnp.concatenate([uv, feats.u_right[feat][:, None]], -1),
            inv_sigma2=1.0 / sigma2,
            is_stereo=feats.u_right[feat] >= 0,
            mask=sel & rr.inliers)
        q, t, inlier, n = pose_opt.pose_optimize(rr.q, rr.t, obs,
                                                 cfg.camera, cfg.optimizer)
        # match-growth rounds (src/Tracking.cc:1452-1502): when the EPnP
        # solution has too few inliers, project the candidate keyframe's
        # points with the current estimate and window-match to add
        # observations, re-optimize; a second narrower round if still
        # short of the 50-inlier bar
        F = feats.xy.shape[0]
        feat_cur = feat
        found = inlier
        for radius_px, th_d in ((10.0, 100), (3.0, 64)):
            if int(n) >= cfg.tracking.reloc_min_inliers:
                break
            uvp, urp, depp, visp = matchers.project_points(
                cfg.camera, q, t, pw)
            grow_mask = qmask & ~found & visp
            radius = radius_px * sf[st.kf_level[c]]
            res2 = matchers.match_window(feats, st.kf_desc[c], grow_mask,
                                         uvp, radius, th=th_d)
            _, res2 = matchers.resolve_conflicts(res2, F)
            new_ok = res2.ok & ~found
            if int(jnp.sum(new_ok)) == 0:
                continue
            feat_cur = jnp.where(found, feat_cur,
                                 jnp.clip(res2.best_feat, 0, F - 1))
            sel2 = found | new_ok
            sigma2_2 = sf[feats.level[feat_cur]] ** 2
            obs2 = pose_opt.PoseObs(
                pw=pw,
                obs=jnp.concatenate(
                    [feats.xy[feat_cur],
                     feats.u_right[feat_cur][:, None]], -1),
                inv_sigma2=1.0 / sigma2_2,
                is_stereo=feats.u_right[feat_cur] >= 0,
                mask=sel2)
            q, t, inlier, n = pose_opt.pose_optimize(q, t, obs2,
                                                     cfg.camera,
                                                     cfg.optimizer)
            found = inlier
        if int(n) < cfg.tracking.reloc_min_inliers:
            continue
        # success: adopt the pose, rebuild the frame association
        frame_mp = jnp.full((F,), ms.NONE, jnp.int32).at[
            jnp.where(inlier, feat_cur, F)].set(
                jnp.where(inlier, kf_mp, ms.NONE), mode="drop")
        tracker.state = TrackerState.OK
        tracker.last_q, tracker.last_t = q, t
        tracker.last_feats = feats
        tracker.last_frame_mp = frame_mp
        tracker.ref_kf = c
        tracker.has_velocity = False
        if tracker.trajectory:
            rec = tracker.trajectory[-1]
            rec.q = np.asarray(q)
            rec.t = np.asarray(t)
            rec.lost = False
            # re-anchor the record on the relocalization keyframe: the
            # pre-lost reference would re-chain this frame through a
            # keyframe unrelated to the recovered pose (and pick up that
            # keyframe's future corrections instead of this one's)
            rec.ref_kf = c
            rec.ref_uid = int(sh.kf_uid[c])
            rec.ref_q = np.asarray(st.kf_q[c])
            rec.ref_t = np.asarray(st.kf_t[c])
        return True
    return False
