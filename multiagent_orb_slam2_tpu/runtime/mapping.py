"""Local-mapping hygiene: point culling, duplicate fusion, observation rebuild.

Replaces LocalMapping::MapPointCulling (reference src/LocalMapping.cc:176-211),
SearchInNeighbors (:460-540) with ORBmatcher::Fuse (src/ORBmatcher.cc:827),
and MapPoint::Replace (src/MapPoint.cc:181). Without this stage the map
accumulates near-duplicate points per keyframe and local-map tracking degrades
(observed directly in early integration testing).

Array formulation notes:
- point merges are expressed as a rewrite table map_to[P]; the forward map
  kf_mp is rewired by one gather, and the inverse observation lists are then
  rebuilt from scratch (`rebuild_observations`) — guaranteed-consistent, and
  a full rebuild is one sort+scatter over [K*F] entries, cheap at KF rate;
- merge chains (a->b->c in one pass) resolve over successive keyframes, like
  the reference's one-pass SearchInNeighbors.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..geometry import se3
from ..mapstate import state as ms
from ..ops import hamming, matchers
from . import steps

NONE = ms.NONE


@functools.partial(jax.jit)
def rebuild_observations(state: ms.MapState):
    """Reconstruct mp_obs_kf/mp_obs_feat from the forward map kf_mp.

    The forward map is the source of truth after fusion/culling edits.
    """
    K, F, P, O = state.caps
    flat_mp = state.kf_mp.reshape(-1)                     # [K*F]
    kf_ids = jnp.repeat(jnp.arange(K, dtype=jnp.int32), F)
    ft_ids = jnp.tile(jnp.arange(F, dtype=jnp.int32), K)
    ok = (flat_mp >= 0) & state.kf_valid[kf_ids] \
        & state.kf_feat_valid.reshape(-1)
    key = jnp.where(ok, flat_mp, P)
    order = jnp.argsort(key, stable=True)
    s_mp = key[order]
    pos = jnp.arange(K * F)
    is_new = jnp.concatenate([jnp.array([True]), s_mp[1:] != s_mp[:-1]])
    seg_start = jax.lax.associative_scan(jnp.maximum,
                                         jnp.where(is_new, pos, 0))
    rank = pos - seg_start
    keep = (s_mp < P) & (rank < O)
    row = jnp.where(keep, s_mp, P)
    col = jnp.where(keep, rank, 0)
    obs_kf = jnp.full((P + 1, O), NONE, jnp.int32).at[row, col].set(
        kf_ids[order], mode="drop")[:P]
    obs_ft = jnp.full((P + 1, O), NONE, jnp.int32).at[row, col].set(
        ft_ids[order], mode="drop")[:P]
    return state._replace(mp_obs_kf=obs_kf, mp_obs_feat=obs_ft)


def _apply_point_rewrite(state: ms.MapState, map_to):
    """Rewire kf_mp through map_to [P] (identity for untouched points) and
    invalidate merged-away points."""
    K, F, P, O = state.caps
    lut = jnp.concatenate([map_to, jnp.array([NONE], jnp.int32)])
    kf_mp = jnp.where(state.kf_mp >= 0, lut[jnp.clip(state.kf_mp, 0, P)],
                      NONE)
    merged_away = map_to != jnp.arange(P, dtype=jnp.int32)
    return state._replace(
        kf_mp=kf_mp,
        mp_valid=state.mp_valid & ~merged_away)


@functools.partial(jax.jit, static_argnames=("cfg",))
def fuse_into_kf(state: ms.MapState, point_ids, target_kf, cfg: SlamConfig,
                 enable=True):
    """Project candidate points into target_kf and fuse duplicates
    (ORBmatcher::Fuse, src/ORBmatcher.cc:827): window-match each projected
    point against the keyframe's features; a hit on a feature that already
    observes another point merges the two (the point with more observations
    wins, MapPoint::Replace); a hit on a free feature adds an association.

    Returns the updated state. point_ids: [Q] int32 (P = padding).
    `enable=False` makes the call a no-op (masked scan iterations in the
    keyframe pipeline).
    """
    K, F, P, O = state.caps
    ids_c = jnp.clip(point_ids, 0, P - 1)
    q_mask = (point_ids < P) & state.mp_valid[ids_c] & enable
    pw = state.mp_pos[ids_c]
    q_kf = state.kf_q[target_kf]
    t_kf = state.kf_t[target_kf]

    uv, ur, depth, vis = matchers.project_points(cfg.camera, q_kf, t_kf, pw)
    q_wc, t_wc = se3.inverse(q_kf, t_kf)
    view = pw - t_wc
    dist = jnp.linalg.norm(view, axis=-1)
    band_ok = (dist >= 0.8 * state.mp_min_dist[ids_c]) \
        & (dist <= 1.2 * state.mp_max_dist[ids_c])
    view_cos = jnp.sum(view * state.mp_normal[ids_c], -1) / jnp.maximum(dist,
                                                                        1e-9)
    q_mask &= vis & band_ok & (view_cos > 0.5)

    sf = jnp.asarray(cfg.orb.scale_factors)
    pred_level = ms.predict_scale(dist, state.mp_max_dist[ids_c],
                                  cfg.orb.scale_factor, cfg.orb.n_levels)
    radius = 3.0 * sf[pred_level]

    # target KF features as a pseudo-frame
    from ..ops.frame import FrameFeatures
    feats = FrameFeatures(
        xy=state.kf_xy[target_kf], response=None,
        level=state.kf_level[target_kf], angle=state.kf_angle[target_kf],
        desc=state.kf_desc[target_kf], valid=state.kf_feat_valid[target_kf],
        u_right=state.kf_right[target_kf], depth=state.kf_depth[target_kf])

    res = matchers.match_window(feats, state.mp_desc[ids_c], q_mask, uv,
                                radius, pred_ur=ur, pred_level=pred_level,
                                th=cfg.matcher.th_low)
    frame_assign, res = matchers.resolve_conflicts(res, F)
    # frame_assign: [F] -> index into point_ids (query), -1 none
    hit = frame_assign >= 0
    pt = jnp.where(hit, point_ids[jnp.clip(frame_assign, 0, P - 1)], NONE)
    pt = jnp.where(hit & (pt < P), pt, NONE)

    existing = state.kf_mp[target_kf]                     # [F]
    n_obs = state.mp_n_obs()

    # case A: free feature -> new association
    add = (pt >= 0) & (existing < 0)
    kf_mp_row = jnp.where(add, pt, existing)

    # case B: occupied feature with a different point -> merge
    merge = (pt >= 0) & (existing >= 0) & (existing != pt)
    a = jnp.clip(pt, 0, P - 1)
    b = jnp.clip(existing, 0, P - 1)
    a_wins = n_obs[a] >= n_obs[b]
    winner = jnp.where(a_wins, a, b)
    loser = jnp.where(a_wins, b, a)
    kf_mp_row = jnp.where(merge, winner, kf_mp_row)

    map_to = jnp.arange(P, dtype=jnp.int32)
    map_to = map_to.at[jnp.where(merge, loser, P)].set(
        jnp.where(merge, winner, 0), mode="drop")

    state = state._replace(kf_mp=state.kf_mp.at[target_kf].set(kf_mp_row))
    state = _apply_point_rewrite(state, map_to)
    return state


@functools.partial(jax.jit, static_argnames=("cfg", "n_max"))
def fuse_into_neighborhood(state: ms.MapState, point_ids, center_kf,
                           cfg: SlamConfig, n_max: int = 15):
    """Fuse a point set into center_kf and its strongest covisible
    neighbors in one scanned dispatch (the SearchAndFuse loops of
    src/LoopClosing.cc:608-634 and src/MapFusion.cc:667/:745-772 — the
    reference iterates the corrected neighborhood keyframe by keyframe)."""
    K = state.kf_q.shape[0]
    row = state.covis[center_kf].at[center_kf].set(0)
    top_w, top_i = jax.lax.top_k(row, min(n_max - 1, K))
    center = jnp.asarray(center_kf, jnp.int32)[None]
    targets = jnp.concatenate([center, top_i.astype(jnp.int32)])
    ok = jnp.concatenate([jnp.ones(1, bool), top_w > 0])
    ok &= state.kf_valid[targets]

    def body(st, x):
        tgt, o = x
        return fuse_into_kf(st, point_ids, tgt, cfg, enable=o), 0

    state, _ = jax.lax.scan(body, state, (targets, ok))
    return state


@functools.partial(jax.jit, static_argnames=("cfg",))
def cull_points_step(state: ms.MapState, newest_kf_slot, cfg: SlamConfig):
    """MapPointCulling (src/LocalMapping.cc:176-211): drop points whose
    found/visible ratio is below 0.25, and recent points (created within the
    last 2 keyframes) that failed to accumulate observations.

    Age is measured in creation-sequence numbers (kf_seq — the reference's
    keyframe mnId arithmetic), NOT slot indices: slots are recycled after
    culling, so slot distance is meaningless. mp_first_kf records the
    creation KF's SLOT; if that slot was itself culled and reused, the seq
    read is from the newer occupant — harmless, since mp_first_kf only
    gates points a couple of keyframes old, whose creation KF is recent.
    """
    K = state.kf_q.shape[0]
    P = state.mp_pos.shape[0]
    ratio = state.mp_found / jnp.maximum(state.mp_visible, 1.0)
    seq_new = state.kf_seq[newest_kf_slot]
    seq_first = state.kf_seq[jnp.clip(state.mp_first_kf, 0, K - 1)]
    age = seq_new - seq_first                          # in KF creations
    n_obs = state.mp_n_obs()
    bad = state.mp_valid & (
        (ratio < cfg.mapping.mp_cull_found_ratio)
        | ((age >= 2) & (age <= 3) & (n_obs <= cfg.mapping.mp_cull_min_obs)))
    # rewire: culled points simply disappear from the forward map
    K, F, _, O = state.caps
    lut_bad = jnp.concatenate([bad, jnp.array([False])])
    kf_mp = jnp.where(lut_bad[jnp.clip(state.kf_mp, 0, P)] & (state.kf_mp >= 0),
                      NONE, state.kf_mp)
    return state._replace(kf_mp=kf_mp, mp_valid=state.mp_valid & ~bad)


def local_mapping_pass(state: ms.MapState, kf_slot: int, cfg: SlamConfig):
    """The synchronous equivalent of one LocalMapping::Run iteration for a
    freshly inserted keyframe (SURVEY.md §3.3): cull -> fuse with covisibility
    neighbors (both directions) -> rebuild inverse obs -> refresh covis +
    point attributes. Local BA follows separately (steps.local_ba_step).
    """
    K, F, P, O = state.caps
    state = cull_points_step(state, kf_slot, cfg)

    # top covisibility neighbors (reference: 10 for stereo, 20 mono)
    nb = cfg.mapping.triangulation_neighbors
    row = state.covis[kf_slot]
    top_w, top_i = jax.lax.top_k(row, min(nb, K))
    neighbors = [int(i) for i, w in zip(top_i.tolist(), top_w.tolist()) if w > 0]

    # direction 1: new KF's points into each neighbor
    own = state.kf_mp[kf_slot]
    own_ids = jnp.where((own >= 0), own, P)
    for n in neighbors:
        state = fuse_into_kf(state, own_ids, n, cfg)

    # direction 2: neighbors' points into the new KF
    if neighbors:
        cand = state.kf_mp[jnp.asarray(neighbors)]        # [NB, F]
        cand_mask = jnp.zeros((P + 1,), bool).at[
            jnp.where(cand >= 0, cand, P).reshape(-1)].set(True)[:P]
        cand_mask &= state.mp_valid
        ids = jnp.nonzero(cand_mask, size=cfg.caps.local_points,
                          fill_value=P)[0]
        state = fuse_into_kf(state, ids, kf_slot, cfg)

    state = rebuild_observations(state)
    state = steps.recompute_covisibility(state)
    touched = jnp.zeros((P + 1,), bool).at[
        jnp.where(own >= 0, own, P)].set(True)[:P]
    state = ms.update_point_descriptors(state, touched)
    state = ms.update_point_normals(state, touched, cfg.orb.scale_factor,
                                    cfg.orb.n_levels)
    return state


# ---------------------------------------------------------------------------
# Keyframe culling (LocalMapping::KeyFrameCulling)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def kf_redundancy(state: ms.MapState, kf_slot, cfg: SlamConfig):
    """Fraction of a keyframe's tracked points that are observed by at least
    3 OTHER keyframes at the same or finer pyramid level (reference
    src/LocalMapping.cc:636-706: the 90% redundancy rule)."""
    K, F, P, O = state.caps
    mp = state.kf_mp[kf_slot]
    mp_ok = (mp >= 0) & state.kf_feat_valid[kf_slot]
    mp_c = jnp.clip(mp, 0, P - 1)
    own_level = state.kf_level[kf_slot]

    obs_kf = state.mp_obs_kf[mp_c]                     # [F, O]
    obs_ft = jnp.clip(state.mp_obs_feat[mp_c], 0, F - 1)
    obs_valid = (obs_kf >= 0) & (obs_kf != kf_slot)
    obs_level = state.kf_level[jnp.clip(obs_kf, 0, K - 1), obs_ft]
    fine = obs_valid & (obs_level <= own_level[:, None] + 1)
    n_fine = jnp.sum(fine, axis=-1)
    redundant = mp_ok & (n_fine >= cfg.mapping.kf_cull_min_obs)
    n_tracked = jnp.sum(mp_ok)
    ratio = jnp.sum(redundant) / jnp.maximum(n_tracked, 1)
    return ratio, n_tracked


@functools.partial(jax.jit)
def erase_keyframe_step(state: ms.MapState, kf_slot):
    """SetBadFlag (reference src/KeyFrame.cc): drop the keyframe, detach its
    observations, reattach its spanning-tree children to its parent."""
    K, F, P, O = state.caps
    parent = state.kf_parent[kf_slot]
    children = state.kf_parent == kf_slot
    kf_parent = jnp.where(children, parent, state.kf_parent)
    kf_parent = kf_parent.at[kf_slot].set(NONE)
    return state._replace(
        kf_valid=state.kf_valid.at[kf_slot].set(False),
        kf_mp=state.kf_mp.at[kf_slot].set(NONE),
        kf_feat_valid=state.kf_feat_valid.at[kf_slot].set(False),
        kf_parent=kf_parent,
        kf_seq=state.kf_seq.at[kf_slot].set(NONE),
        covis=state.covis.at[kf_slot, :].set(0).at[:, kf_slot].set(0),
    )


def keyframe_culling(state: ms.MapState, center_kf: int, cfg: SlamConfig,
                     max_cull: int = 3):
    """Cull redundant covisibility neighbors of a fresh keyframe (the
    reference checks the new KF's local neighbors after local BA,
    src/LocalMapping.cc:101-106, :636). Origin keyframes are exempt
    (:647-650). Returns (state, culled_slot_list, cull_info) where
    cull_info maps slot -> (parent_slot, rel_q, rel_t), the pose relative
    to the spanning-tree parent at cull time (the reference's KeyFrame
    mTcp, src/KeyFrame.cc SetBadFlag) — needed to re-chain exported
    trajectories through erased reference keyframes
    (src/System.cc:390-448)."""
    row = np.asarray(state.covis[center_kf])
    fixed = np.asarray(state.kf_fixed_origin)
    valid = np.asarray(state.kf_valid)
    culled = []
    cull_info = {}
    for k in np.argsort(-row):
        if len(culled) >= max_cull or row[k] <= 0:
            break
        if fixed[k] or not valid[k] or k == center_kf:
            continue
        ratio, n_tracked = kf_redundancy(state, int(k), cfg)
        if float(ratio) > cfg.mapping.kf_cull_redundancy \
                and int(n_tracked) > 20:
            parent = int(state.kf_parent[k])
            if parent >= 0:
                rel_q, rel_t = se3.relative(
                    state.kf_q[k], state.kf_t[k],
                    state.kf_q[parent], state.kf_t[parent])
                cull_info[int(k)] = (parent, np.asarray(rel_q),
                                     np.asarray(rel_t))
            state = erase_keyframe_step(state, int(k))
            culled.append(int(k))
    if culled:
        state = rebuild_observations(state)
        state = steps.recompute_covisibility(state)
    return state, culled, cull_info
