"""Map fusion: Sim3-merge two logical maps inside the shared MapState.

Replaces MapFusion::FuseMaps + CovisibilityDiscovery + the post-fusion GBA
(reference src/MapFusion.cc:420-743, :774-964, :966-1102). With all maps in
one array state, the reference's ownership move (:477-493) is a relabel of
kf_map/mp_map; the Sim3 pose/point correction (:509-627) is one batched
transform over the masked current map; spanning-tree reversal (:636-662) is a
parent-pointer rewrite along the query chain.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..geometry import se3, sim3
from ..mapstate import state as ms
from ..runtime import mapping, steps
from ..runtime import loop_closing as lc
from ..vocab import kfdb as kfdb_mod

NONE = ms.NONE


def correct_map(st: ms.MapState, map_mask_kf, map_mask_mp, kf_q: int,
                s, q, t):
    """Sim3-correct an entire logical map given the corrected Sim3
    (world -> query camera) of one of its keyframes (reference corrected-pose
    propagation, src/MapFusion.cc:509-627).

    Every KF i of the map: T_iw_new = (T_i_q_old as Sim3) * S_qw_corrected,
    translation divided by scale for SE3 recovery. Every point: re-anchored
    through the query camera frame.
    """
    K = st.kf_q.shape[0]
    q_old, t_old = st.kf_q[kf_q], st.kf_t[kf_q]
    qi_rel, ti_rel = se3.relative(st.kf_q, st.kf_t, q_old, t_old)
    s_i, q_i, t_i = sim3.compose(jnp.ones(K), qi_rel, ti_rel,
                                 jnp.broadcast_to(s, (K,)),
                                 jnp.broadcast_to(q, (K, 4)),
                                 jnp.broadcast_to(t, (K, 3)))
    q_new, t_new = sim3.to_se3(s_i, q_i, t_i)
    q_new = se3.quat_normalize(q_new)

    # points: p_new = S_qw_corrected^-1 (T_qw_old (p))
    pc = se3.apply(q_old, t_old, st.mp_pos)
    si, qi, ti = sim3.inverse(s, q, t)
    p_new = sim3.apply(jnp.broadcast_to(si, pc.shape[:1]),
                       jnp.broadcast_to(qi, pc.shape[:1] + (4,)),
                       jnp.broadcast_to(ti, pc.shape[:1] + (3,)), pc)
    return st._replace(
        kf_q=jnp.where(map_mask_kf[:, None], q_new, st.kf_q),
        kf_t=jnp.where(map_mask_kf[:, None], t_new, st.kf_t),
        mp_pos=jnp.where(map_mask_mp[:, None], p_new, st.mp_pos))


def reverse_spanning_tree(st: ms.MapState, kf_q: int, kf_m: int):
    """Reverse the parent chain from the query KF up to its map origin and
    attach the query to the matched KF (reference src/MapFusion.cc:636-662)."""
    parent = np.asarray(st.kf_parent).copy()
    chain = []
    k = kf_q
    seen = set()
    while k >= 0 and k not in seen:
        seen.add(k)
        chain.append(k)
        k = int(parent[k])
    # reverse: each node's new parent is its old child on the chain
    for child, par in zip(chain[:-1], chain[1:]):
        parent[par] = child
    parent[kf_q] = kf_m
    return st._replace(kf_parent=jnp.asarray(parent))


def merge_maps(shared, multimap, match: lc.Sim3Match, cur_map: int,
               dst_map: int, cfg: SlamConfig, global_db=None, vocab=None):
    """FuseMaps (src/MapFusion.cc:420-743): correct + relabel the current map
    into the matched map, dedup points, rewire the spanning tree, update the
    registry. Returns the number of fused keyframes (for stats)."""
    st = shared.state
    kf_q, kf_m = match.kf_query, match.kf_match

    cur_kf = np.asarray(st.kf_map) == cur_map
    cur_mp = np.asarray(st.mp_map) == cur_map
    n_moved = int(cur_kf.sum())

    # corrected Sim3 of the query: S_qw = S_qm * T_mw (match-KF world pose)
    s_c, q_c, t_c = sim3.compose(
        jnp.asarray(match.s), jnp.asarray(match.q), jnp.asarray(match.t),
        *sim3.from_se3(st.kf_q[kf_m], st.kf_t[kf_m]))

    st = correct_map(st, jnp.asarray(cur_kf), jnp.asarray(cur_mp), kf_q,
                     s_c, q_c, t_c)
    # relabel ownership (the reference's KF/MP 'move', src/MapFusion.cc:477-493)
    st = st._replace(
        kf_map=jnp.where(jnp.asarray(cur_kf), dst_map, st.kf_map),
        mp_map=jnp.where(jnp.asarray(cur_mp), dst_map, st.mp_map),
        # absorbed map's origin anchors stop being BA gauge anchors
        kf_fixed_origin=jnp.where(jnp.asarray(cur_kf), False,
                                  st.kf_fixed_origin))
    st = reverse_spanning_tree(st, kf_q, kf_m)
    shared.state = st

    # dedup matched points around the seam (reference SearchAndFuse :667)
    ids = jnp.asarray(match.point_ids)
    shared.state = mapping.fuse_into_neighborhood(shared.state, ids, kf_q,
                                                  cfg)
    shared.state = mapping.rebuild_observations(shared.state)
    shared.state = steps.recompute_covisibility(shared.state)

    multimap.merge(cur_map, dst_map)
    return n_moved


@functools.partial(jax.jit, static_argnames=())
def _batched_cd_candidates(db, vocab, desc_b, valid_b, moved_mask, covis):
    """Candidate masks for ALL moved keyframes in one program: a batched BoW
    transform + one score/common-word matrix + the grouped-candidate filter,
    vmapped over the query axis (the reference's per-KF
    DetectCovisibilityCandidates loop, src/MapFusion.cc:819-820, done as one
    masked matrix computation)."""
    def one(desc, valid):
        from ..vocab import bow as bow_mod
        words = bow_mod.transform_words(vocab, desc, valid)
        vec = bow_mod.bow_vector(vocab, words, valid)
        cand, _ = kfdb_mod.detect_covisibility_candidates(
            db, words, valid, vec, moved_mask, covis)
        return cand
    return jax.vmap(one)(desc_b, valid_b)                   # [Nm, K]


def covisibility_discovery(shared, server_db, vocab, moved_kf_slots,
                           cfg: SlamConfig):
    """Cross-agent duplicate-point discovery over the moved keyframes
    (reference MapFusion::CovisibilityDiscovery, src/MapFusion.cc:774-964):
    for each moved KF, find BoW-similar KFs outside the moved set and fuse
    each one's points into the moved KF (both directions, reference
    :903-910). Covers EVERY moved keyframe and every detected candidate —
    no caps (the reference sweeps the full moved set).

    Returns (n_processed, per_kf_ms): fused candidate count and the per-KF
    wall-time list feeding the cd-sum/mean/stdev/med stats columns
    (reference :933-956)."""
    import time
    st = shared.state
    K, F, P, O = st.caps
    moved = np.zeros(K, bool)
    moved[moved_kf_slots] = True
    if not moved_kf_slots:
        return 0, []

    # batched candidate detection over all moved KFs (padded to a bucket
    # size so jit caches stay warm across fusions of different sizes)
    slots = np.asarray(moved_kf_slots, np.int32)
    Nm = len(slots)
    pad = max(8, -(-Nm // 8) * 8)
    slots_p = np.concatenate([slots, np.zeros(pad - Nm, np.int32)])
    cand_b = _batched_cd_candidates(
        server_db, vocab, st.kf_desc[jnp.asarray(slots_p)],
        st.kf_feat_valid[jnp.asarray(slots_p)],
        jnp.asarray(moved), st.covis)
    cand_b = np.asarray(cand_b)[:Nm]                        # [Nm, K]

    # flatten to (moved KF, candidate) pairs and fuse them all in ONE
    # scanned dispatch — the earlier per-pair host loop cost two dispatches
    # plus a blocking sync per pair (~minutes at the reference's KITTI-02
    # scale of ~726 moved KFs against a CD budget of 15.3 s, BASELINE.md)
    kk, cc = np.nonzero(cand_b)
    n_processed = len(kk)
    if n_processed == 0:
        return 0, []
    t0 = time.perf_counter()
    npairs = max(16, -(-n_processed // 16) * 16)
    k_arr = np.zeros(npairs, np.int32)
    c_arr = np.zeros(npairs, np.int32)
    ok_arr = np.zeros(npairs, bool)
    k_arr[:n_processed] = slots[kk]
    c_arr[:n_processed] = cc
    ok_arr[:n_processed] = True
    shared.state = _cd_fuse_pairs(shared.state, jnp.asarray(k_arr),
                                  jnp.asarray(c_arr), jnp.asarray(ok_arr),
                                  cfg)
    shared.state = mapping.rebuild_observations(shared.state)
    shared.state = steps.recompute_covisibility(shared.state)
    jax.block_until_ready(shared.state.kf_mp)
    total_ms = (time.perf_counter() - t0) * 1e3
    # per-KF attribution is no longer individually timed (one fused
    # dispatch); the stats columns get the uniform split
    per_kf_ms = [total_ms / Nm] * Nm
    return n_processed, per_kf_ms


@functools.partial(jax.jit, static_argnames=("cfg",))
def _cd_fuse_pairs(state: ms.MapState, k_arr, c_arr, ok_arr,
                   cfg: SlamConfig):
    """Fuse (candidate -> moved KF) and (moved KF -> candidate) for every
    pair under lax.scan (the reference's ORBmatcher::Fuse per candidate
    pair, src/MapFusion.cc:903-910)."""
    K, F, P, O = state.caps

    def body(st, x):
        k, c, ok = x
        ids = st.kf_mp[c]
        ids = jnp.where(ids >= 0, ids, P)
        st = mapping.fuse_into_kf(st, ids, k, cfg, enable=ok)
        ids_k = st.kf_mp[k]
        ids_k = jnp.where(ids_k >= 0, ids_k, P)
        st = mapping.fuse_into_kf(st, ids_k, c, cfg, enable=ok)
        return st, 0

    state, _ = jax.lax.scan(body, state, (k_arr, c_arr, ok_arr))
    return state
