"""Loop-closing end-to-end on a fabricated drifted trajectory.

Builds a map whose keyframe chain has accumulated drift, with the last
keyframe physically back at the start (same scene content as KF 0/1), then
drives LoopCloser.compute_sim3 + correct_loop and checks the drift is
removed. This exercises the full cascade (descriptor matching, Sim3 RANSAC,
OptimizeSim3, neighborhood correction, essential graph, GBA) without needing
a rendered revisit sequence.
"""
import pytest

pytestmark = pytest.mark.e2e

import numpy as np
import jax.numpy as jnp
import pytest

from multiagent_orb_slam2_tpu.config import (SlamConfig, OrbConfig, Capacities,
                                             Sensor, LoopConfig)
from multiagent_orb_slam2_tpu.geometry import se3
from multiagent_orb_slam2_tpu.geometry.camera import Intrinsics
from multiagent_orb_slam2_tpu.mapstate import state as ms
from multiagent_orb_slam2_tpu.ops.frame import FrameFeatures
from multiagent_orb_slam2_tpu.runtime import loop_closing as lc
from multiagent_orb_slam2_tpu.runtime import mapping
from multiagent_orb_slam2_tpu.runtime.tracker import SharedMap
from multiagent_orb_slam2_tpu.vocab import bow as bow_mod

CAM = Intrinsics(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=45.0)
CFG = SlamConfig(
    camera=CAM, sensor=Sensor.STEREO,
    orb=OrbConfig(n_features=256, n_levels=4),
    loop=LoopConfig(consistency_th=1, refractory_kfs=3, min_total_matches=30),
    caps=Capacities(max_keyframes=16, max_points=4096, max_features=256,
                    local_points=2048),
)


def build_drifted_loop(n_kf=10, n_pts_per=80, drift=0.03, seed=0):
    """Ground truth: cameras on a circle, world points around each position.
    Estimated: drifty odometry chain. Last KF truly revisits KF0's area."""
    rng = np.random.default_rng(seed)
    F = CFG.caps.max_features
    shared = SharedMap(CFG)
    st = shared.state

    # ground-truth poses on a loop (camera-to-world)
    qs_gt, ts_gt = [], []
    for k in range(n_kf):
        # last pose wraps onto the first: a true revisit
        ang = 2 * np.pi * k / (n_kf - 1)
        q = np.asarray(se3.so3_exp_quat(jnp.asarray([0.0, ang, 0.0])))
        t = np.array([4 * np.sin(ang), 0.0, 4 - 4 * np.cos(ang)], np.float32)
        qs_gt.append(q)
        ts_gt.append(t)

    # shared world points: clusters ahead of each GT camera
    pts, descs, owner = [], [], []
    for k in range(n_kf):
        R = np.asarray(se3.quat_to_matrix(jnp.asarray(qs_gt[k])))
        ahead = ts_gt[k] + R @ np.array([0, 0, 6.0])
        p = ahead + rng.uniform(-2, 2, (n_pts_per, 3))
        pts.append(p)
        descs.append(rng.integers(0, 2**32, (n_pts_per, 8), dtype=np.uint32))
        owner += [k] * n_pts_per
    pts = np.concatenate(pts).astype(np.float32)
    descs = np.concatenate(descs)
    owner = np.asarray(owner)

    # drifty estimated poses (world-to-camera): drift ACCUMULATES as a
    # random walk, so relative measurements between neighbors carry only
    # per-step noise while absolute error grows along the chain — the
    # error structure loop closure exists to repair (white per-pose noise
    # would corrupt the relative constraints the pose graph relies on)
    q_est, t_est = [], []
    xi_acc = np.zeros(6)
    for k in range(n_kf):
        qcw, tcw = se3.inverse(jnp.asarray(qs_gt[k]), jnp.asarray(ts_gt[k]))
        if k == 0:
            q_est.append(np.asarray(qcw))
            t_est.append(np.asarray(tcw))
        else:
            xi_acc = xi_acc + np.concatenate([
                rng.normal(0, drift, 3), rng.normal(0, drift * 0.3, 3)])
            dq, dt = se3.se3_exp(jnp.asarray(xi_acc))
            qq, tt = se3.compose(dq, dt, qcw, tcw)
            q_est.append(np.asarray(qq))
            t_est.append(np.asarray(tt))

    # drifted world points: each point as seen by its owner KF, unprojected
    # with the DRIFTED pose (consistent map + drift)
    pts_est = pts.copy()
    for k in range(n_kf):
        sel = owner == k
        qcw_gt, tcw_gt = se3.inverse(jnp.asarray(qs_gt[k]),
                                     jnp.asarray(ts_gt[k]))
        pc = se3.apply(qcw_gt, tcw_gt, jnp.asarray(pts[sel]))
        qwc_e, twc_e = se3.inverse(jnp.asarray(q_est[k]),
                                   jnp.asarray(t_est[k]))
        pts_est[sel] = np.asarray(se3.apply(qwc_e, twc_e, pc))

    # insert KFs. Each sees its own + previous cluster. The LAST keyframe
    # additionally sees cluster 0's CONTENT, but because of drift its
    # tracking created DUPLICATE map points for it (unprojected through the
    # drifted pose) — the situation loop closing must detect and repair.
    mp_ids = np.arange(len(pts))
    n_dup = 0
    for k in range(n_kf):
        is_last = k == n_kf - 1
        vis_mask = (owner == k)
        if k > 0:
            vis_mask |= owner == k - 1
        if is_last:
            vis_mask |= owner == 0
        vis = np.nonzero(vis_mask)[0]
        qcw_gt, tcw_gt = se3.inverse(jnp.asarray(qs_gt[k]),
                                     jnp.asarray(ts_gt[k]))
        pc = np.asarray(se3.apply(qcw_gt, tcw_gt, jnp.asarray(pts[vis])))
        ok = pc[:, 2] > 0.5
        vis, pc = vis[ok], pc[ok]
        u = CAM.fx * pc[:, 0] / pc[:, 2] + CAM.cx
        v = CAM.fy * pc[:, 1] / pc[:, 2] + CAM.cy
        inb = (u >= 0) & (u < 640) & (v >= 0) & (v < 480)
        vis, u, v, pc = vis[inb], u[inb], v[inb], pc[inb]
        n = min(len(vis), F)
        vis, u, v, pc = vis[:n], u[:n], v[:n], pc[:n]
        ur = u - CAM.bf / pc[:, 2]

        # slot assignment: own/previous clusters use canonical ids; the last
        # KF's cluster-0 sightings get fresh duplicate slots
        slots = mp_ids[vis].copy()
        is_new = owner[vis] == k
        if is_last:
            dup_sel = owner[vis] == 0
            dup_slots = len(pts) + np.arange(dup_sel.sum())
            slots[dup_sel] = dup_slots
            is_new = is_new | dup_sel
            n_dup = int(dup_sel.sum())

        # positions for newly created points: unproject from the DRIFTED pose
        qwc_e, twc_e = se3.inverse(jnp.asarray(q_est[k]),
                                   jnp.asarray(t_est[k]))
        p_drift = np.asarray(se3.apply(qwc_e, twc_e, jnp.asarray(pc)))
        pos_new = np.where(is_new[:, None], p_drift, pts_est[vis])

        feats = FrameFeatures(
            xy=jnp.zeros((F, 2)).at[:n].set(jnp.asarray(np.stack([u, v], -1))),
            response=jnp.zeros(F),
            level=jnp.zeros(F, jnp.int32),
            angle=jnp.zeros(F),
            desc=jnp.zeros((F, 8), jnp.uint32).at[:n].set(
                jnp.asarray(descs[vis])),
            valid=jnp.zeros(F, bool).at[:n].set(True),
            u_right=jnp.full(F, -1.0).at[:n].set(jnp.asarray(ur)),
            depth=jnp.full(F, -1.0).at[:n].set(jnp.asarray(pc[:, 2])))
        frame_mp = jnp.full((F,), -1, jnp.int32).at[:n].set(
            jnp.asarray(slots, jnp.int32))

        # realistic scale band: max_dist ~ creation distance at level 0
        # (a fake max_dist sends predict_scale to a level the level-0
        # features can never satisfy, silencing fuse/track matching)
        dist_k = np.linalg.norm(pos_new - np.asarray(twc_e)[None], axis=1)
        sf_top = CFG.orb.scale_factors[-1]
        st = ms.add_points(
            st, jnp.asarray(slots, jnp.int32), jnp.asarray(pos_new,
                                                           jnp.float32),
            jnp.asarray(descs[vis]),
            jnp.zeros((n, 3)).at[:, 2].set(1.0),
            jnp.asarray(dist_k / sf_top, jnp.float32),
            jnp.asarray(dist_k * 1.05, jnp.float32),
            ref_kf=jnp.full(n, k, jnp.int32),
            agent=jnp.zeros(n, jnp.int32), map_id=jnp.zeros(n, jnp.int32),
            valid=jnp.asarray(is_new))
        st = ms.insert_keyframe(st, k, feats, jnp.asarray(q_est[k]),
                                jnp.asarray(t_est[k]), k, 0, 0, frame_mp,
                                parent=k - 1 if k > 0 else -1,
                                fixed_origin=(k == 0))
    shared.state = st
    shared.n_kf = n_kf
    shared.n_mp = len(pts) + n_dup
    return shared, (qs_gt, ts_gt), descs


def test_loop_close_removes_drift():
    shared, (qs_gt, ts_gt), descs = build_drifted_loop()
    vocab = bow_mod.train_vocabulary(
        np.random.default_rng(9).integers(0, 2**32, (2000, 8),
                                          dtype=np.uint32), k=6, depth=3)
    closer = lc.LoopCloser(CFG, vocab)
    # drift of the last KF before correction
    st = shared.state
    n_kf = shared.n_kf
    last = n_kf - 1

    def kf_err(k):
        qwc, twc = se3.inverse(st.kf_q[k], st.kf_t[k])
        return float(jnp.linalg.norm(twc - jnp.asarray(ts_gt[k])))

    err_before = kf_err(last)
    assert err_before > 0.05, "fixture should have visible drift"

    # the loop candidate: last KF vs KF 0 (they share KF0's cluster content
    # only through appearance; feed candidate directly to compute_sim3)
    match = closer.compute_sim3(shared, last, 0)
    assert match is not None, "Sim3 verification failed on fabricated loop"

    closer.correct_loop(shared, match, run_gba=True)
    st = shared.state
    err_after = kf_err(last)
    assert err_after < err_before * 0.6, (err_before, err_after)
    assert err_after < 0.035


def build_drifted_ring(n_kf=110, n_rev=5, n_pts_per=60, drift=0.02, seed=2,
                       cfg=None):
    """A long drifted ring whose FINAL n_rev keyframes revisit the first
    viewpoints (same clusters, duplicate slots, drifted poses) — the input
    shape DetectLoop -> consistency-accumulation needs (reference
    src/LoopClosing.cc:126-252). Returns (shared, gt poses)."""
    cfg = cfg or CFG
    rng = np.random.default_rng(seed)
    F = cfg.caps.max_features
    shared = SharedMap(cfg)
    st = shared.state
    n_base = n_kf - n_rev

    def ring_ang(k):
        if k < n_base:
            return 2 * np.pi * k / n_base
        return 2 * np.pi * (k - n_base) / n_base   # wrap onto the start

    qs_gt, ts_gt = [], []
    for k in range(n_kf):
        ang = ring_ang(k)
        q = np.asarray(se3.so3_exp_quat(jnp.asarray([0.0, ang, 0.0])))
        t = np.array([8 * np.sin(ang), 0.0, 8 - 8 * np.cos(ang)], np.float32)
        qs_gt.append(q)
        ts_gt.append(t)

    # one point cluster per BASE keyframe
    pts, descs, owner = [], [], []
    for k in range(n_base):
        R = np.asarray(se3.quat_to_matrix(jnp.asarray(qs_gt[k])))
        ahead = ts_gt[k] + R @ np.array([0, 0, 6.0])
        pts.append(ahead + rng.uniform(-2, 2, (n_pts_per, 3)))
        descs.append(rng.integers(0, 2**32, (n_pts_per, 8), dtype=np.uint32))
        owner += [k] * n_pts_per
    pts = np.concatenate(pts).astype(np.float32)
    descs = np.concatenate(descs)
    owner = np.asarray(owner)

    # drifty estimated chain: random-walk drift (small per-step relative
    # noise, accumulating absolute error — see build_drifted_loop)
    q_est, t_est = [], []
    xi_acc = np.zeros(6)
    for k in range(n_kf):
        qcw, tcw = se3.inverse(jnp.asarray(qs_gt[k]), jnp.asarray(ts_gt[k]))
        if k == 0:
            q_est.append(np.asarray(qcw))
            t_est.append(np.asarray(tcw))
        else:
            xi_acc = xi_acc + np.concatenate([
                rng.normal(0, drift, 3), rng.normal(0, drift * 0.3, 3)])
            dq, dt = se3.se3_exp(jnp.asarray(xi_acc))
            qq, tt = se3.compose(dq, dt, qcw, tcw)
            q_est.append(np.asarray(qq))
            t_est.append(np.asarray(tt))

    pts_est = pts.copy()
    for k in range(n_base):
        sel = owner == k
        qcw_gt, tcw_gt = se3.inverse(jnp.asarray(qs_gt[k]),
                                     jnp.asarray(ts_gt[k]))
        pc = se3.apply(qcw_gt, tcw_gt, jnp.asarray(pts[sel]))
        qwc_e, twc_e = se3.inverse(jnp.asarray(q_est[k]),
                                   jnp.asarray(t_est[k]))
        pts_est[sel] = np.asarray(se3.apply(qwc_e, twc_e, pc))

    next_slot = len(pts)
    for k in range(n_kf):
        k0 = k if k < n_base else k - n_base
        vis_mask = (owner == k0) | (owner == (k0 - 1) % n_base)
        vis = np.nonzero(vis_mask)[0]
        qcw_gt, tcw_gt = se3.inverse(jnp.asarray(qs_gt[k]),
                                     jnp.asarray(ts_gt[k]))
        pc = np.asarray(se3.apply(qcw_gt, tcw_gt, jnp.asarray(pts[vis])))
        ok = pc[:, 2] > 0.5
        vis, pc = vis[ok], pc[ok]
        u = CAM.fx * pc[:, 0] / pc[:, 2] + CAM.cx
        v = CAM.fy * pc[:, 1] / pc[:, 2] + CAM.cy
        inb = (u >= 0) & (u < 640) & (v >= 0) & (v < 480)
        vis, u, v, pc = vis[inb], u[inb], v[inb], pc[inb]
        n = min(len(vis), F)
        vis, u, v, pc = vis[:n], u[:n], v[:n], pc[:n]
        ur = u - CAM.bf / pc[:, 2]

        slots = mp_ids_of = vis.copy()
        is_new = np.zeros(len(vis), bool)
        if k < n_base:
            is_new = owner[vis] == k
        else:
            # revisit: tracking re-created DUPLICATE points for everything
            slots = next_slot + np.arange(len(vis))
            next_slot += len(vis)
            is_new = np.ones(len(vis), bool)

        qwc_e, twc_e = se3.inverse(jnp.asarray(q_est[k]),
                                   jnp.asarray(t_est[k]))
        p_drift = np.asarray(se3.apply(qwc_e, twc_e, jnp.asarray(pc)))
        pos_new = np.where(is_new[:, None], p_drift, pts_est[vis])

        feats = FrameFeatures(
            xy=jnp.zeros((F, 2)).at[:n].set(jnp.asarray(np.stack([u, v], -1))),
            response=jnp.zeros(F), level=jnp.zeros(F, jnp.int32),
            angle=jnp.zeros(F),
            desc=jnp.zeros((F, 8), jnp.uint32).at[:n].set(
                jnp.asarray(descs[vis])),
            valid=jnp.zeros(F, bool).at[:n].set(True),
            u_right=jnp.full(F, -1.0).at[:n].set(jnp.asarray(ur)),
            depth=jnp.full(F, -1.0).at[:n].set(jnp.asarray(pc[:, 2])))
        frame_mp = jnp.full((F,), -1, jnp.int32).at[:n].set(
            jnp.asarray(slots, jnp.int32))
        slot = shared.alloc_kf()
        assert slot == k
        dist_k = np.linalg.norm(pos_new - np.asarray(twc_e)[None], axis=1)
        sf_top = CFG.orb.scale_factors[-1]
        st = ms.add_points(
            st, jnp.asarray(slots, jnp.int32),
            jnp.asarray(pos_new, jnp.float32), jnp.asarray(descs[vis]),
            jnp.zeros((n, 3)).at[:, 2].set(1.0),
            jnp.asarray(dist_k / sf_top, jnp.float32),
            jnp.asarray(dist_k * 1.05, jnp.float32),
            ref_kf=jnp.full(n, k, jnp.int32),
            agent=jnp.zeros(n, jnp.int32), map_id=jnp.zeros(n, jnp.int32),
            valid=jnp.asarray(is_new))
        st = st._replace(kf_seq=st.kf_seq.at[k].set(k))
        st = ms.insert_keyframe(st, k, feats, jnp.asarray(q_est[k]),
                                jnp.asarray(t_est[k]), k, 0, 0, frame_mp,
                                parent=k - 1 if k > 0 else -1,
                                fixed_origin=(k == 0))
        shared.state = st
    shared.n_kf = n_kf
    shared.n_mp = next_slot
    return shared, (qs_gt, ts_gt)


@pytest.mark.e2e
def test_loop_detected_through_front_door():
    """Drive loop closing through its OWN detection path at scale: ~110
    keyframes, drift, a 5-keyframe revisit tail — process_keyframe must
    detect the loop (BoW candidates + covisibility-consistency >= 3),
    verify Sim3 and correct it WITHOUT any injected candidate (reference
    src/LoopClosing.cc:126-252 + :425-606)."""
    cfg = CFG.replace(
        caps=Capacities(max_keyframes=128, max_points=16384,
                        max_features=256, local_points=2048),
        loop=LoopConfig())      # reference thresholds: consistency 3 etc.
    shared, (qs_gt, ts_gt) = build_drifted_ring(n_kf=110, n_rev=5, drift=0.01,
                                                cfg=cfg)
    vocab = bow_mod.train_vocabulary(
        np.random.default_rng(11).integers(0, 2**32, (3000, 8),
                                           dtype=np.uint32), k=6, depth=3)
    closer = lc.LoopCloser(cfg, vocab)

    def kf_err(k):
        st = shared.state
        qwc, twc = se3.inverse(st.kf_q[k], st.kf_t[k])
        return float(jnp.linalg.norm(twc - jnp.asarray(ts_gt[k])))

    errs_before = np.array([kf_err(k) for k in range(110)])
    assert errs_before[-1] > 0.1, "fixture should have visible drift"

    matches = []
    for k in range(110):
        m = closer.process_keyframe(shared, k)
        if m is not None:
            matches.append(m)
            closer.correct_loop(shared, m, run_gba=True)
    # the loop must have been found by detection (not injection), on a
    # revisit keyframe, against an early keyframe
    assert matches, "no loop detected through the front door"
    assert matches[0].kf_query >= 105, matches[0]
    assert matches[0].kf_match <= 8, matches[0]
    errs_after = np.array([kf_err(k) for k in range(110)])
    # the corrected query keyframe snaps onto the revisited region
    assert kf_err(matches[0].kf_query) < 0.02
    # the revisit tail (where the loop closes) improves substantially; a
    # single loop edge cannot beat the Brownian-bridge floor mid-chain, so
    # the whole-trajectory check is a strict mean improvement
    assert errs_after[-1] < errs_before[-1] * 0.75, (
        errs_before[-1], errs_after[-1])
    assert errs_after.mean() < errs_before.mean(), (
        errs_before.mean(), errs_after.mean())
