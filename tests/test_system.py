"""System facade: relocalization after kidnap, checkpoint/resume."""
import numpy as np
import jax.numpy as jnp
import pytest

from multiagent_orb_slam2_tpu.config import (SlamConfig, OrbConfig, Capacities,
                                             Sensor, TrackingConfig)
from multiagent_orb_slam2_tpu.geometry import se3
from multiagent_orb_slam2_tpu.io.synthetic import BoxScene, corridor_trajectory
from multiagent_orb_slam2_tpu.geometry.camera import Intrinsics
from multiagent_orb_slam2_tpu.runtime.system import System
from multiagent_orb_slam2_tpu.runtime.tracker import TrackerState
from multiagent_orb_slam2_tpu.vocab import bow as bow_mod
from multiagent_orb_slam2_tpu.ops import frame as frame_mod

CAM = Intrinsics(fx=230.0, fy=230.0, cx=160.0, cy=120.0, bf=115.0,
                 width=320, height=240)
CFG = SlamConfig(
    camera=CAM, sensor=Sensor.STEREO,
    orb=OrbConfig(n_features=400, n_levels=4),
    tracking=TrackingConfig(max_frames_between_kf=4, th_depth=60.0),
    caps=Capacities(max_keyframes=32, max_points=8192, max_features=512,
                    local_points=4096),
)
N = 10


@pytest.fixture(scope="module")
def run_sequence():
    scene = BoxScene(seed=17, z_far=40.0)
    q_wc, t_wc = corridor_trajectory(N, step=0.15, seed=4)
    frames = [scene.render_stereo(CAM, q_wc[i], t_wc[i])[:2] for i in range(N)]
    descs = []
    for i in (0, N - 1):
        f = frame_mod.extract_frame(jnp.asarray(frames[i][0]), CFG,
                                    right_img=jnp.asarray(frames[i][1]))
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    vocab = bow_mod.train_vocabulary(np.concatenate(descs), k=8, depth=3,
                                     seed=6)
    sys_ = System(CFG, vocab, enable_loop_closing=False)
    for i in range(N):
        sys_.track_stereo(frames[i][0], frames[i][1], frame_id=i)
    return sys_, frames, (q_wc, t_wc)


def test_relocalization_after_kidnap(run_sequence, tmp_path):
    sys_, frames, (q_wc, t_wc) = run_sequence
    assert sys_.tracker.state == TrackerState.OK
    # kidnap: black frames destroy tracking
    black = np.zeros((240, 320), np.float32)
    for j in range(2):
        sys_.track_stereo(black, black, frame_id=N + j)
    assert sys_.tracker.state == TrackerState.LOST
    # revisit frame 3's viewpoint -> relocalize
    sys_.track_stereo(frames[3][0], frames[3][1], frame_id=N + 2)
    assert sys_.tracker.state == TrackerState.OK
    assert sys_.n_relocalizations >= 1
    _, twc = se3.inverse(sys_.tracker.last_q, sys_.tracker.last_t)
    err = np.linalg.norm(np.asarray(twc) - t_wc[3])
    assert err < 0.1, err


def test_checkpoint_roundtrip(run_sequence, tmp_path):
    sys_, frames, _ = run_sequence
    p = str(tmp_path / "map.npz")
    sys_.save_map(p)
    vocab = sys_.vocab
    sys2 = System(CFG, vocab, enable_loop_closing=False)
    sys2.load_map(p)
    assert sys2.shared.n_kf == sys_.shared.n_kf
    np.testing.assert_array_equal(np.asarray(sys2.shared.state.kf_q),
                                  np.asarray(sys_.shared.state.kf_q))
    np.testing.assert_array_equal(np.asarray(sys2.shared.state.mp_valid),
                                  np.asarray(sys_.shared.state.mp_valid))


def test_trajectory_export(run_sequence, tmp_path):
    sys_, _, _ = run_sequence
    pt = str(tmp_path / "traj_tum.txt")
    pk = str(tmp_path / "traj_kitti.txt")
    sys_.save_trajectory_tum(pt)
    sys_.save_trajectory_kitti(pk)
    from multiagent_orb_slam2_tpu.io import trajectory as T
    tum = T.read_tum(pt)
    assert tum.shape[1] == 8
    kitti = T.read_kitti(pk)
    assert kitti.shape[1:] == (3, 4)
    # TUM quaternions normalized
    np.testing.assert_allclose(np.linalg.norm(tum[:, 4:], axis=1), 1.0,
                               atol=1e-5)
