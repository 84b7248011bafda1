"""Trajectory export must pick up loop-closure corrections retroactively.

The reference SaveTrajectoryTUM (src/System.cc:390-448) stores each frame's
pose RELATIVE to its reference keyframe and re-chains it through the
keyframe's current pose at save time, walking mTcp snapshots through culled
keyframes. This test drives the equivalent: a drifted loop is corrected, and
the EXPORTED full-frame trajectory ATE must drop accordingly — including for
frames whose reference keyframe is culled after the correction (the
cull_info / uid chain).
"""
import pytest

pytestmark = pytest.mark.e2e

import numpy as np
import jax.numpy as jnp

from multiagent_orb_slam2_tpu.geometry import se3
from multiagent_orb_slam2_tpu.runtime import loop_closing as lc
from multiagent_orb_slam2_tpu.runtime import mapping
from multiagent_orb_slam2_tpu.runtime.tracker import FrameRecord, Tracker
from multiagent_orb_slam2_tpu.vocab import bow as bow_mod

from test_loop_closing import CFG, build_drifted_loop


def _setup():
    # 2x the default drift so the exported-before/after contrast is clearly
    # above the frame-offset noise floor
    shared, (qs_gt, ts_gt), descs = build_drifted_loop(drift=0.06)
    n_kf = shared.n_kf
    # the fixture inserts keyframes directly; register them with the slot
    # allocator so uid-keyed export/cull bookkeeping is live
    for k in range(n_kf):
        shared.kf_uid[k] = k
        shared.uid_slot[k] = k
    shared.n_created = n_kf
    shared.state = shared.state._replace(
        kf_seq=shared.state.kf_seq.at[jnp.arange(n_kf)].set(
            jnp.arange(n_kf, dtype=jnp.int32)))

    tracker = Tracker(CFG, shared)
    st = shared.state
    # three frames per keyframe, each a small known offset from its ref KF.
    # Track-time estimates ride the DRIFTED keyframe pose; ground truth
    # rides the true pose.
    rng = np.random.default_rng(0)
    gt_t_wc = []
    fid = 0
    for k in range(n_kf):
        q_est_k = np.asarray(st.kf_q[k])
        t_est_k = np.asarray(st.kf_t[k])
        qcw_gt, tcw_gt = se3.inverse(jnp.asarray(qs_gt[k]),
                                     jnp.asarray(ts_gt[k]))
        for j in range(3):
            dvec = np.concatenate([rng.normal(0, 0.02, 3),
                                   rng.normal(0, 0.01, 3)]).astype(np.float32)
            dq, dt = se3.se3_exp(jnp.asarray(dvec))
            # recorded (drifted) frame pose: Delta * T_est_k
            q_f, t_f = se3.compose(dq, dt, jnp.asarray(q_est_k),
                                   jnp.asarray(t_est_k))
            # ground-truth frame pose: Delta * T_gt_k
            q_g, t_g = se3.compose(dq, dt, qcw_gt, tcw_gt)
            _, t_wc_g = se3.inverse(q_g, t_g)
            gt_t_wc.append(np.asarray(t_wc_g))
            tracker.trajectory.append(FrameRecord(
                frame_id=fid, q=np.asarray(q_f), t=np.asarray(t_f),
                lost=False, ref_kf=k, ref_uid=k,
                ref_q=q_est_k, ref_t=t_est_k))
            fid += 1
    return shared, tracker, np.stack(gt_t_wc), (qs_gt, ts_gt)


def _export_ate(tracker, gt_t_wc, tail=None):
    est = []
    for _, lost, q, t in tracker.export_poses():
        assert not lost
        _, t_wc = se3.inverse(jnp.asarray(q), jnp.asarray(t))
        est.append(np.asarray(t_wc))
    est = np.stack(est)
    sl = slice(-tail, None) if tail else slice(None)
    return float(np.sqrt(np.mean(
        np.sum((est[sl] - gt_t_wc[sl]) ** 2, -1))))


def test_export_improves_after_loop_correction():
    shared, tracker, gt_t_wc, _ = _setup()
    vocab = bow_mod.train_vocabulary(
        np.random.default_rng(9).integers(0, 2**32, (2000, 8),
                                          dtype=np.uint32), k=6, depth=3)
    closer = lc.LoopCloser(CFG, vocab)
    n_kf = shared.n_kf

    # drift concentrates at the loop tail: gate on the LAST keyframe's
    # frames — the Sim3 anchors that keyframe directly, so its exported
    # frames must snap to ground truth after correction
    ate_before = _export_ate(tracker, gt_t_wc, tail=3)
    assert ate_before > 0.06, "fixture should have visible drift"

    match = closer.compute_sim3(shared, n_kf - 1, 0)
    assert match is not None
    closer.correct_loop(shared, match, run_gba=True)

    ate_after = _export_ate(tracker, gt_t_wc, tail=3)
    assert tracker.export_fallbacks == 0
    assert ate_after < ate_before * 0.6, (ate_before, ate_after)
    assert ate_after < 0.06, (ate_before, ate_after)

    # --- cull a reference keyframe AFTER the correction: frames that
    # referenced it must re-chain through the cull_info snapshot onto the
    # (corrected) parent, not fall back to raw track-time poses -----------
    ate_full = _export_ate(tracker, gt_t_wc)     # full-trajectory, pre-cull
    st = shared.state
    victim = 2
    parent = int(np.asarray(st.kf_parent[victim]))
    assert parent >= 0
    rel_q, rel_t = se3.relative(st.kf_q[victim], st.kf_t[victim],
                                st.kf_q[parent], st.kf_t[parent])
    shared.state = mapping.erase_keyframe_step(st, victim)
    shared.note_culled(victim, parent, np.asarray(rel_q), np.asarray(rel_t))

    ate_culled = _export_ate(tracker, gt_t_wc)   # full-trajectory, post-cull
    assert tracker.export_fallbacks == 0, \
        "culled-reference frames fell back to uncorrected poses"
    assert ate_culled < ate_full * 1.25 + 1e-6, (ate_full, ate_culled)


def test_export_fallback_counted_on_missing_chain():
    """A reference keyframe invalidated WITHOUT cull info (reset path) is
    counted as an export fallback, not silently mis-anchored."""
    shared, tracker, gt_t_wc, _ = _setup()
    st = shared.state
    victim = 1
    shared.state = mapping.erase_keyframe_step(st, victim)
    shared.note_invalidated(victim)     # no cull_info entry
    tracker.export_poses()
    assert tracker.export_fallbacks == 3   # the three frames anchored on it
