"""Multi-agent server integration: two agents on a split sequence fuse into
one map (the reference's generic_split_seq scenario, SURVEY.md §3.4)."""
import pytest

pytestmark = pytest.mark.e2e

import numpy as np
import jax.numpy as jnp
import pytest

from multiagent_orb_slam2_tpu.config import (SlamConfig, OrbConfig, Capacities,
                                             Sensor, TrackingConfig, LoopConfig)
from multiagent_orb_slam2_tpu.geometry import se3
from multiagent_orb_slam2_tpu.geometry.camera import Intrinsics
from multiagent_orb_slam2_tpu.io.synthetic import BoxScene, corridor_trajectory
from multiagent_orb_slam2_tpu.io import trajectory as traj_mod
from multiagent_orb_slam2_tpu.ops import frame as frame_mod
from multiagent_orb_slam2_tpu.server import MultiAgentServer
from multiagent_orb_slam2_tpu.vocab import bow as bow_mod

CAM = Intrinsics(fx=230.0, fy=230.0, cx=160.0, cy=120.0, bf=115.0,
                 width=320, height=240)
CFG = SlamConfig(
    camera=CAM, sensor=Sensor.STEREO,
    orb=OrbConfig(n_features=400, n_levels=4),
    tracking=TrackingConfig(max_frames_between_kf=4, th_depth=60.0),
    loop=LoopConfig(consistency_th=2, refractory_kfs=4),
    caps=Capacities(max_keyframes=64, max_points=16384, max_features=512,
                    local_points=4096),
)

N_FRAMES = 20
SPLIT_LO, SPLIT_HI = 0, 12     # agent 0 frames
SPLIT2_LO, SPLIT2_HI = 8, 20   # agent 1 frames (overlap 8..11)


@pytest.fixture(scope="module")
def fused_run():
    scene = BoxScene(seed=11, z_far=40.0)
    q_wc, t_wc = corridor_trajectory(N_FRAMES, step=0.15, seed=2)
    frames = []
    for i in range(N_FRAMES):
        left, right, _ = scene.render_stereo(CAM, q_wc[i], t_wc[i])
        frames.append(frame_mod.extract_frame(
            jnp.asarray(left), CFG, right_img=jnp.asarray(right)))

    # vocabulary trained on the scene's own descriptors (the reference ships
    # a pre-trained ORBvoc; here we train on held-out frames)
    descs = np.concatenate([np.asarray(frames[i].desc)[np.asarray(frames[i].valid)]
                            for i in (0, N_FRAMES // 2, N_FRAMES - 1)])
    vocab = bow_mod.train_vocabulary(descs, k=8, depth=3, seed=5)

    server = MultiAgentServer(CFG, vocab, run_gba=True)
    t0 = server.register_client(0)
    t1 = server.register_client(1)

    for i in range(N_FRAMES):
        if SPLIT_LO <= i < SPLIT_HI:
            t0.track_features(frames[i], frame_id=i)
        if SPLIT2_LO <= i < SPLIT2_HI:
            t1.track_features(frames[i], frame_id=i - SPLIT2_LO)
        server.process_new_keyframes()

    return server, (q_wc, t_wc)


def test_maps_fused(fused_run):
    server, _ = fused_run
    assert server.multimap.n_maps == 1, \
        f"maps not fused: {server.multimap.map_of_agent}, stats={server.stats}"
    assert len(server.stats) >= 1
    st = server.stats[0]
    assert st["ckf"] >= 2  # keyframes moved


def test_fused_trajectory_accuracy(fused_run):
    server, (q_wc_gt, t_wc_gt) = fused_run
    st = server.shared.state
    kf_valid = np.asarray(st.kf_valid)
    agents = np.asarray(st.kf_agent)
    frame_ids = np.asarray(st.kf_frame_id)
    est, gt = [], []
    for k in np.nonzero(kf_valid)[0]:
        q_wc, t_wc = se3.inverse(st.kf_q[k], st.kf_t[k])
        est.append(np.asarray(t_wc))
        fid = frame_ids[k] + (SPLIT2_LO if agents[k] == 1 else 0)
        gt.append(t_wc_gt[fid])
    est, gt = np.stack(est), np.stack(gt)
    res = traj_mod.ate(est, gt, with_scale=False)
    assert res["rmse"] < 0.12, (res, est - gt)


N3_FRAMES = 30


@pytest.fixture(scope="module")
def fused_run_3():
    """Three agents on overlapping thirds of one corridor (the reference
    exercises -n 2..4, Examples/MultiAgent/generic_split_seq.cc:592-712)."""
    scene = BoxScene(seed=12, z_far=40.0)
    q_wc, t_wc = corridor_trajectory(N3_FRAMES, step=0.15, seed=3)
    frames = []
    for i in range(N3_FRAMES):
        left, right, _ = scene.render_stereo(CAM, q_wc[i], t_wc[i])
        frames.append(frame_mod.extract_frame(
            jnp.asarray(left), CFG, right_img=jnp.asarray(right)))

    descs = np.concatenate(
        [np.asarray(frames[i].desc)[np.asarray(frames[i].valid)]
         for i in (0, N3_FRAMES // 2, N3_FRAMES - 1)])
    vocab = bow_mod.train_vocabulary(descs, k=8, depth=3, seed=6)

    server = MultiAgentServer(CFG, vocab, run_gba=True)
    trackers = [server.register_client(a) for a in range(3)]
    windows = [(0, 14), (10, 24), (20, 30)]   # 4-frame overlaps
    for i in range(N3_FRAMES):
        for a, (lo, hi) in enumerate(windows):
            if lo <= i < hi:
                trackers[a].track_features(frames[i], frame_id=i - lo)
        server.process_new_keyframes()
    return server, windows, (q_wc, t_wc)


def test_three_agents_fuse_to_one_map(fused_run_3):
    server, windows, _ = fused_run_3
    assert server.multimap.n_maps == 1, \
        f"maps not fused: {server.multimap.map_of_agent}, " \
        f"stats={[(s['cur_map'], s['dst_map']) for s in server.stats]}"
    assert len(server.stats) >= 2    # two fusion events collapse 3 maps
