"""MapState: the fixed-capacity, batched replacement for Map/KeyFrame/MapPoint.

Reference model (SURVEY.md §2d): a heap of KeyFrame/MapPoint objects with
per-object mutexes, covisibility adjacency lists, and std::map observation
dictionaries. TPU model: one NamedTuple of arrays —

- keyframe axis K: poses, per-feature arrays [K, F], validity;
- point axis P: positions, distinctive descriptors, viewing stats;
- observations stored BOTH directions with bounded capacity:
    forward  kf_mp   [K, F]  feature -> observed point (-1 none)
    inverse  mp_obs_{kf,feat} [P, O] point -> (keyframe, feature)
  (the inverse map is what MapPoint::GetObservations provides and what the
  Schur reduction in optim.ba consumes directly);
- dense covisibility weight matrix [K, K] int32 (KeyFrame::GetCovisibles* is
  a masked row read; UpdateConnections is a segment-sum histogram);
- spanning tree parent array (KeyFrame::GetParent / ChangeParent);
- multi-agent/multi-map membership ids on both axes (the fork's per-System
  bookkeeping, include/KeyFrame.h:50-56, include/Map.h:44-52).

Mutation functions return new states (functional updates); the host
orchestrator owns slot allocation counters.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..ops.frame import FrameFeatures

NONE = -1  # empty slot marker for index arrays


class MapState(NamedTuple):
    # --- keyframes -------------------------------------------------------
    kf_q: jnp.ndarray          # [K, 4] world-to-camera quaternion
    kf_t: jnp.ndarray          # [K, 3]
    kf_valid: jnp.ndarray      # [K] bool
    kf_frame_id: jnp.ndarray   # [K] int32 source frame index
    kf_agent: jnp.ndarray      # [K] int32 owning agent
    kf_map: jnp.ndarray        # [K] int32 logical map id
    kf_parent: jnp.ndarray     # [K] int32 spanning-tree parent (-1 root)
    kf_fixed_origin: jnp.ndarray  # [K] bool BA gauge anchors (Map origin KFs)
    kf_seq: jnp.ndarray        # [K] int32 creation sequence number (the
    #                            reference's monotonically-increasing mnId,
    #                            include/KeyFrame.h — slots are RECYCLED
    #                            after culling, so slot order is not age)
    # per-feature arrays
    kf_xy: jnp.ndarray         # [K, F, 2] undistorted level-0 coords
    kf_right: jnp.ndarray      # [K, F] right-image u (-1 mono/no match)
    kf_depth: jnp.ndarray      # [K, F] depth (-1 unknown)
    kf_level: jnp.ndarray      # [K, F] int32
    kf_angle: jnp.ndarray      # [K, F]
    kf_desc: jnp.ndarray       # [K, F, 8] uint32
    kf_feat_valid: jnp.ndarray  # [K, F] bool
    kf_mp: jnp.ndarray         # [K, F] int32 -> point slot (-1 none)
    # --- map points ------------------------------------------------------
    mp_pos: jnp.ndarray        # [P, 3]
    mp_valid: jnp.ndarray      # [P] bool
    mp_desc: jnp.ndarray       # [P, 8] uint32 distinctive descriptor
    mp_normal: jnp.ndarray     # [P, 3] mean viewing direction
    mp_min_dist: jnp.ndarray   # [P] scale-invariance band
    mp_max_dist: jnp.ndarray   # [P]
    mp_ref_kf: jnp.ndarray     # [P] int32 reference keyframe
    mp_agent: jnp.ndarray      # [P] int32 creating agent
    mp_map: jnp.ndarray        # [P] int32 logical map id
    mp_visible: jnp.ndarray    # [P] float32 visibility counter
    mp_found: jnp.ndarray      # [P] float32 found counter
    mp_first_kf: jnp.ndarray   # [P] int32 creation KF (for culling age)
    # inverse observations
    mp_obs_kf: jnp.ndarray     # [P, O] int32 (-1 empty)
    mp_obs_feat: jnp.ndarray   # [P, O] int32
    # --- graph -----------------------------------------------------------
    covis: jnp.ndarray         # [K, K] int32 shared-observation weights

    # convenience --------------------------------------------------------
    @property
    def caps(self):
        K, F = self.kf_mp.shape
        P, O = self.mp_obs_kf.shape
        return K, F, P, O

    def mp_n_obs(self):
        return jnp.sum(self.mp_obs_kf >= 0, axis=-1)


def empty_map_state(cfg: SlamConfig) -> MapState:
    K = cfg.caps.max_keyframes
    F = cfg.caps.max_features
    P = cfg.caps.max_points
    O = cfg.caps.max_obs_per_point
    i32 = jnp.int32
    return MapState(
        kf_q=jnp.zeros((K, 4)).at[:, 0].set(1.0),
        kf_t=jnp.zeros((K, 3)),
        kf_valid=jnp.zeros(K, bool),
        kf_frame_id=jnp.full(K, NONE, i32),
        kf_agent=jnp.full(K, NONE, i32),
        kf_map=jnp.full(K, NONE, i32),
        kf_parent=jnp.full(K, NONE, i32),
        kf_fixed_origin=jnp.zeros(K, bool),
        kf_seq=jnp.full(K, NONE, i32),
        kf_xy=jnp.zeros((K, F, 2)),
        kf_right=jnp.full((K, F), -1.0),
        kf_depth=jnp.full((K, F), -1.0),
        kf_level=jnp.zeros((K, F), i32),
        kf_angle=jnp.zeros((K, F)),
        kf_desc=jnp.zeros((K, F, 8), jnp.uint32),
        kf_feat_valid=jnp.zeros((K, F), bool),
        kf_mp=jnp.full((K, F), NONE, i32),
        mp_pos=jnp.zeros((P, 3)),
        mp_valid=jnp.zeros(P, bool),
        mp_desc=jnp.zeros((P, 8), jnp.uint32),
        mp_normal=jnp.zeros((P, 3)),
        mp_min_dist=jnp.zeros(P),
        mp_max_dist=jnp.full(P, 1e9),
        mp_ref_kf=jnp.full(P, NONE, i32),
        mp_agent=jnp.full(P, NONE, i32),
        mp_map=jnp.full(P, NONE, i32),
        mp_visible=jnp.ones(P),
        mp_found=jnp.ones(P),
        mp_first_kf=jnp.full(P, NONE, i32),
        mp_obs_kf=jnp.full((P, O), NONE, i32),
        mp_obs_feat=jnp.full((P, O), NONE, i32),
        covis=jnp.zeros((K, K), i32),
    )


# ---------------------------------------------------------------------------
# Observation bookkeeping
# ---------------------------------------------------------------------------

def add_observations(state: MapState, kf_slot, feat_idx, mp_idx, valid):
    """Record observations (kf_slot, feat_idx[i]) -> mp_idx[i].

    Updates the forward map kf_mp and appends to each point's inverse
    observation list (first free slot; silently drops if the point's O slots
    are full — bounded-capacity analogue of MapPoint::AddObservation,
    src/MapPoint.cc:84-97).
    """
    K, F, P, O = state.caps
    mp_safe = jnp.where(valid, mp_idx, P)  # P = scatter-discard row

    # forward: kf_mp[kf_slot, feat] = mp
    kf_mp = state.kf_mp.at[kf_slot, jnp.where(valid, feat_idx, F)].set(
        mp_idx, mode="drop")

    # inverse: find first free slot per point. Multiple new obs never target
    # the same point within one call (feature->point is injective per KF).
    free = state.mp_obs_kf < 0                       # [P, O]
    first_free = jnp.argmax(free, axis=-1)           # [P]
    has_free = jnp.any(free, axis=-1)
    slot = first_free[jnp.clip(mp_safe, 0, P - 1)]
    ok = valid & has_free[jnp.clip(mp_safe, 0, P - 1)]
    row = jnp.where(ok, mp_safe, P)
    mp_obs_kf = state.mp_obs_kf.at[row, slot].set(
        jnp.broadcast_to(jnp.asarray(kf_slot, jnp.int32), row.shape),
        mode="drop")
    mp_obs_feat = state.mp_obs_feat.at[row, slot].set(
        feat_idx.astype(jnp.int32), mode="drop")
    return state._replace(kf_mp=kf_mp, mp_obs_kf=mp_obs_kf,
                          mp_obs_feat=mp_obs_feat)


def update_covisibility(state: MapState, kf_slot):
    """Recompute covisibility row/col for one keyframe from shared
    observations (KeyFrame::UpdateConnections, src/KeyFrame.cc:304-395:
    weight = #shared MapPoints; here the th=15 edge filter is applied at read
    time, not storage time)."""
    K, F, P, O = state.caps
    mp = state.kf_mp[kf_slot]                             # [F]
    mp_safe = jnp.clip(mp, 0, P - 1)
    obs_kf = jnp.where((mp >= 0)[:, None],
                       state.mp_obs_kf[mp_safe], NONE)    # [F, O]
    flat = jnp.where(obs_kf >= 0, obs_kf, K).reshape(-1)
    w = jax.ops.segment_sum(jnp.ones_like(flat), flat, num_segments=K + 1)[:K]
    w = w.at[kf_slot].set(0)
    w = (w * state.kf_valid).astype(jnp.int32)
    covis = state.covis.at[kf_slot, :].set(w).at[:, kf_slot].set(w)
    return state._replace(covis=covis)


def covis_neighbors_mask(state: MapState, kf_slot, min_weight: int = 1):
    """Row read of the covisibility graph (GetCovisiblesByWeight)."""
    return (state.covis[kf_slot] >= min_weight) & state.kf_valid


# ---------------------------------------------------------------------------
# Keyframe insertion
# ---------------------------------------------------------------------------

def insert_keyframe(state: MapState, kf_slot, feats: FrameFeatures, q, t,
                    frame_id, agent, map_id, mp_assign, parent,
                    fixed_origin=False):
    """Write a new keyframe into slot kf_slot and register its observations.

    mp_assign: [F] int32 point slot per feature (-1 none) — the tracked map
    point associations carried over from the frame (Tracking::CreateNewKeyFrame
    src/Tracking.cc:1076-1154).
    """
    K, F, P, O = state.caps
    state = state._replace(
        kf_q=state.kf_q.at[kf_slot].set(q),
        kf_t=state.kf_t.at[kf_slot].set(t),
        kf_valid=state.kf_valid.at[kf_slot].set(True),
        kf_frame_id=state.kf_frame_id.at[kf_slot].set(frame_id),
        kf_agent=state.kf_agent.at[kf_slot].set(agent),
        kf_map=state.kf_map.at[kf_slot].set(map_id),
        kf_parent=state.kf_parent.at[kf_slot].set(parent),
        kf_fixed_origin=state.kf_fixed_origin.at[kf_slot].set(fixed_origin),
        kf_xy=state.kf_xy.at[kf_slot].set(feats.xy),
        kf_right=state.kf_right.at[kf_slot].set(feats.u_right),
        kf_depth=state.kf_depth.at[kf_slot].set(feats.depth),
        kf_level=state.kf_level.at[kf_slot].set(feats.level),
        kf_angle=state.kf_angle.at[kf_slot].set(feats.angle),
        kf_desc=state.kf_desc.at[kf_slot].set(feats.desc),
        kf_feat_valid=state.kf_feat_valid.at[kf_slot].set(feats.valid),
    )
    feat_idx = jnp.arange(F, dtype=jnp.int32)
    valid = (mp_assign >= 0) & feats.valid
    state = add_observations(state, kf_slot, feat_idx, mp_assign, valid)
    return update_covisibility(state, kf_slot)


def add_points(state: MapState, slots, pos, desc, normal, min_dist, max_dist,
               ref_kf, agent, map_id, valid):
    """Batch-create map points in the given slots (MapPoint ctor +
    Map::AddMapPoint). slots: [N] int32; invalid entries scatter-dropped."""
    K, F, P, O = state.caps
    row = jnp.where(valid, slots, P)
    return state._replace(
        mp_pos=state.mp_pos.at[row].set(pos, mode="drop"),
        mp_valid=state.mp_valid.at[row].set(True, mode="drop"),
        mp_desc=state.mp_desc.at[row].set(desc, mode="drop"),
        mp_normal=state.mp_normal.at[row].set(normal, mode="drop"),
        mp_min_dist=state.mp_min_dist.at[row].set(min_dist, mode="drop"),
        mp_max_dist=state.mp_max_dist.at[row].set(max_dist, mode="drop"),
        mp_ref_kf=state.mp_ref_kf.at[row].set(ref_kf, mode="drop"),
        mp_agent=state.mp_agent.at[row].set(agent, mode="drop"),
        mp_map=state.mp_map.at[row].set(map_id, mode="drop"),
        mp_first_kf=state.mp_first_kf.at[row].set(ref_kf, mode="drop"),
        mp_visible=state.mp_visible.at[row].set(1.0, mode="drop"),
        mp_found=state.mp_found.at[row].set(1.0, mode="drop"),
        mp_obs_kf=state.mp_obs_kf.at[row].set(NONE, mode="drop"),
        mp_obs_feat=state.mp_obs_feat.at[row].set(NONE, mode="drop"),
    )


# ---------------------------------------------------------------------------
# Derived point attributes
# ---------------------------------------------------------------------------

def update_point_descriptors(state: MapState, point_mask):
    """Medoid descriptor per point (ComputeDistinctiveDescriptors,
    src/MapPoint.cc:246): the observed descriptor minimizing the median
    Hamming distance to all other observations of the point.

    point_mask: [P] bool — which points to refresh (others untouched).
    """
    from ..ops import hamming
    K, F, P, O = state.caps
    kf = jnp.clip(state.mp_obs_kf, 0, K - 1)
    ft = jnp.clip(state.mp_obs_feat, 0, F - 1)
    descs = state.kf_desc[kf, ft]                       # [P, O, 8]
    valid = state.mp_obs_kf >= 0                        # [P, O]
    d = hamming.popcount_u32(
        jnp.bitwise_xor(descs[:, :, None, :], descs[:, None, :, :])
    ).sum(-1)                                           # [P, O, O]
    big = 10_000
    d = jnp.where(valid[:, :, None] & valid[:, None, :], d, big)
    # median over valid columns ~ sorted take at n_valid/2 (reference takes
    # median of each row and picks the min)
    d_sorted = jnp.sort(d, axis=-1)
    n_val = jnp.sum(valid, axis=-1)                     # [P]
    med_idx = jnp.clip(n_val // 2, 0, O - 1)
    med = jnp.take_along_axis(
        d_sorted, med_idx[:, None, None].repeat(O, 1), axis=-1)[..., 0]
    med = jnp.where(valid, med, big)
    best = jnp.argmin(med, axis=-1)                     # [P]
    new_desc = jnp.take_along_axis(descs, best[:, None, None], axis=1)[:, 0]
    upd = point_mask & (n_val > 0)
    return state._replace(
        mp_desc=jnp.where(upd[:, None], new_desc, state.mp_desc))


def update_point_normals(state: MapState, point_mask, scale_factor: float,
                         n_levels: int):
    """Viewing normal + scale-invariance distance band
    (UpdateNormalAndDepth, src/MapPoint.cc:334)."""
    K, F, P, O = state.caps
    kf = jnp.clip(state.mp_obs_kf, 0, K - 1)
    valid = state.mp_obs_kf >= 0
    # camera centers: Ow = -R^T t
    from ..geometry import se3
    q_all, t_all = state.kf_q, state.kf_t
    qi, ti = se3.inverse(q_all, t_all)
    centers = ti                                        # [K, 3] camera origins
    c = centers[kf]                                     # [P, O, 3]
    v = state.mp_pos[:, None, :] - c
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v = v / jnp.maximum(norm, 1e-9)
    normal = jnp.sum(jnp.where(valid[..., None], v, 0.0), axis=1)
    n_val = jnp.maximum(jnp.sum(valid, axis=-1), 1)
    normal = normal / n_val[:, None]
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)

    # distance band from the reference keyframe's observation level
    ref = jnp.clip(state.mp_ref_kf, 0, K - 1)
    # find the feature index of the ref observation (first obs slot)
    ref_c = centers[ref]
    dist = jnp.linalg.norm(state.mp_pos - ref_c, axis=-1)
    ft0 = jnp.clip(state.mp_obs_feat[:, 0], 0, F - 1)
    kf0 = jnp.clip(state.mp_obs_kf[:, 0], 0, K - 1)
    level = state.kf_level[kf0, ft0]
    level_sf = scale_factor ** level.astype(jnp.float32)
    max_dist = dist * level_sf
    min_dist = max_dist / (scale_factor ** (n_levels - 1))
    upd = point_mask & (jnp.sum(valid, -1) > 0)
    return state._replace(
        mp_normal=jnp.where(upd[:, None], normal, state.mp_normal),
        mp_max_dist=jnp.where(upd, max_dist, state.mp_max_dist),
        mp_min_dist=jnp.where(upd, min_dist, state.mp_min_dist))


def predict_scale(dist, max_dist, scale_factor: float, n_levels: int):
    """Predict the pyramid level at which a point should be observed given its
    distance (MapPoint::PredictScale)."""
    ratio = jnp.maximum(max_dist, 1e-9) / jnp.maximum(dist, 1e-9)
    level = jnp.ceil(jnp.log(ratio) / jnp.log(scale_factor))
    return jnp.clip(level, 0, n_levels - 1).astype(jnp.int32)
