"""Monocular end-to-end: two-view init + tracking + triangulation-based
mapping on a synthetic corridor (scale-free ATE)."""
import pytest

pytestmark = pytest.mark.e2e

import numpy as np
import jax.numpy as jnp
import pytest

from multiagent_orb_slam2_tpu.config import (SlamConfig, OrbConfig, Capacities,
                                             Sensor, TrackingConfig)
from multiagent_orb_slam2_tpu.geometry import se3
from multiagent_orb_slam2_tpu.geometry.camera import Intrinsics
from multiagent_orb_slam2_tpu.io.synthetic import BoxScene
from multiagent_orb_slam2_tpu.io import trajectory as traj_mod
from multiagent_orb_slam2_tpu.runtime.tracker import SharedMap, Tracker

CAM = Intrinsics(fx=230.0, fy=230.0, cx=160.0, cy=120.0, bf=0.0,
                 width=320, height=240)
CFG = SlamConfig(
    camera=CAM, sensor=Sensor.MONOCULAR,
    orb=OrbConfig(n_features=400, n_levels=4),
    tracking=TrackingConfig(max_frames_between_kf=5, th_depth=60.0,
                            min_inliers_track_local_map=20),
    caps=Capacities(max_keyframes=32, max_points=8192, max_features=512,
                    local_points=4096),
)

N_FRAMES = 16


def make_traj():
    """Sideways-arc motion: good parallax for mono init."""
    from multiagent_orb_slam2_tpu.geometry import se3 as s
    qs, ts = [], []
    rng = np.random.default_rng(3)
    for i in range(N_FRAMES):
        yaw = -0.012 * i
        q = np.asarray(s.so3_exp_quat(jnp.asarray([0.0, yaw, 0.0])))
        t = np.array([0.12 * i, 0.0, 0.05 * i]) + rng.normal(0, 0.002, 3)
        qs.append(q)
        ts.append(t)
    return np.stack(qs), np.stack(ts)


def test_mono_pipeline():
    scene = BoxScene(seed=13, z_far=30.0)
    q_wc, t_wc = make_traj()
    shared = SharedMap(CFG)
    tracker = Tracker(CFG, shared)

    for i in range(N_FRAMES):
        left, _ = scene.render(CAM, q_wc[i], t_wc[i])
        tracker.track_mono(left, frame_id=i)

    lost = [i for i, r in enumerate(tracker.trajectory) if r.lost]
    # mono needs a couple of frames to initialize; no losses after that
    assert tracker.state == 1, f"tracker not OK; lost frames {lost}"
    init_frame = min(r.frame_id for r in tracker.trajectory if not r.lost)
    assert init_frame <= 6
    tracked = [r for r in tracker.trajectory if not r.lost]
    assert len(tracked) >= N_FRAMES - init_frame - 2

    est, gt = [], []
    for rec in tracked:
        _, twc = se3.inverse(jnp.asarray(rec.q), jnp.asarray(rec.t))
        est.append(np.asarray(twc))
        gt.append(t_wc[rec.frame_id])
    est, gt = np.stack(est), np.stack(gt)
    res = traj_mod.ate(est, gt, with_scale=True)   # mono: scale-free
    assert res["rmse"] < 0.08, res
