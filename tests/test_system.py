"""System facade: relocalization after kidnap, checkpoint/resume."""
import pytest

pytestmark = pytest.mark.e2e

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


def test_auto_reset_when_lost_early():
    """Reference src/Tracking.cc:483-491: losing track with <= 5 keyframes
    triggers a full reset instead of waiting for relocalization luck."""
    scene = BoxScene(seed=3, z_far=40.0)
    q_wc, t_wc = corridor_trajectory(3, step=0.15, seed=1)
    vocab = bow_mod.train_vocabulary(
        np.random.default_rng(0).integers(0, 2**32, (300, 8),
                                          dtype=np.uint32), k=8, depth=2)
    sys_ = System(CFG, vocab, enable_loop_closing=False)
    for i in range(3):
        L, R, _ = scene.render_stereo(CAM, q_wc[i], t_wc[i])
        sys_.track_stereo(L, R, frame_id=i)
    assert sys_.tracker.state == TrackerState.OK
    n_created_before = sys_.shared.n_created
    assert n_created_before <= 5
    black = np.zeros((240, 320), np.float32)
    sys_.track_stereo(black, black, frame_id=3)      # -> LOST
    sys_.track_stereo(black, black, frame_id=4)      # LOST + tiny map -> reset
    assert sys_.tracker.state == TrackerState.NOT_INITIALIZED
    # the old map was dropped (no valid keyframes of this agent remain)
    st = sys_.shared.state
    assert int(np.asarray(st.kf_valid).sum()) == 0
    # and tracking restarts cleanly on real imagery
    L, R, _ = scene.render_stereo(CAM, q_wc[0], t_wc[0])
    sys_.track_stereo(L, R, frame_id=5)
    assert sys_.tracker.state == TrackerState.OK


def test_relocalization_match_growth():
    """Reference src/Tracking.cc:1452-1502: when EPnP lands < 50 inliers,
    two projection-guided match-growth rounds add observations and
    re-optimize. Constructed so brute BoW matching alone yields < 50
    matches (most descriptors are corrupted past th_low) but the growth
    window (th_high) recovers them — success therefore REQUIRES growth."""
    from multiagent_orb_slam2_tpu.mapstate import state as ms_mod
    from multiagent_orb_slam2_tpu.runtime import steps
    from multiagent_orb_slam2_tpu.ops import matchers

    rng = np.random.default_rng(7)
    n = 150
    z = rng.uniform(4, 12, n)
    pw = np.stack([rng.uniform(-0.4, 0.4, n) * z,
                   rng.uniform(-0.3, 0.3, n) * z, z], -1).astype(np.float32)
    descs = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    vocab = bow_mod.train_vocabulary(descs, k=8, depth=2)
    sys_ = System(CFG, vocab, enable_loop_closing=False)
    F = CFG.caps.max_features

    # keyframe 0 at identity observing all points (stereo features)
    u = CAM.fx * pw[:, 0] / z + CAM.cx
    v = CAM.fy * pw[:, 1] / z + CAM.cy
    kf_feats = frame_mod.FrameFeatures(
        xy=jnp.zeros((F, 2)).at[:n].set(jnp.asarray(np.stack([u, v], -1))),
        response=jnp.zeros(F), level=jnp.zeros(F, jnp.int32),
        angle=jnp.zeros(F),
        desc=jnp.zeros((F, 8), jnp.uint32).at[:n].set(jnp.asarray(descs)),
        valid=jnp.zeros(F, bool).at[:n].set(True),
        u_right=jnp.full(F, -1.0).at[:n].set(jnp.asarray(u - CAM.bf / z)),
        depth=jnp.full(F, -1.0).at[:n].set(jnp.asarray(z)))
    sh = sys_.shared
    slot = sh.alloc_kf()
    sh.state, _, n_new = steps.stereo_init_step(
        sh.state, kf_feats, 0, 0, 0, slot, sh.mp_base(), CFG)
    sh.commit_mp(int(n_new))
    sys_.tracker.new_kf_slots.append(slot)
    sys_.tracker.ref_kf = slot
    sys_._process_keyframes()          # registers KF 0 in the reloc DB

    # query frame at a displaced pose; only 40 descriptors survive intact,
    # the rest are corrupted by ~70 bit flips (> th_low, < th_high)
    q_cw, t_cw = se3.inverse(*se3.se3_exp(jnp.asarray(
        [0.25, -0.1, 0.1, 0.0, 0.03, 0.0])))
    pc = np.asarray(se3.apply(q_cw, t_cw, jnp.asarray(pw)))
    zq = pc[:, 2]
    uq = CAM.fx * pc[:, 0] / zq + CAM.cx + rng.normal(0, 0.3, n)
    vq = CAM.fy * pc[:, 1] / zq + CAM.cy + rng.normal(0, 0.3, n)
    descs_q = descs.copy()
    bits = np.unpackbits(descs_q.view(np.uint8), axis=1)
    for i in range(40, n):
        flip = rng.choice(256, size=70, replace=False)
        bits[i, flip] ^= 1
    descs_q = np.packbits(bits, axis=1).view(np.uint32)
    vis = (uq >= 0) & (uq < CAM.width) & (vq >= 0) & (vq < CAM.height) \
        & (zq > 0.1)
    q_feats = frame_mod.FrameFeatures(
        xy=jnp.zeros((F, 2)).at[:n].set(jnp.asarray(np.stack([uq, vq], -1))),
        response=jnp.zeros(F), level=jnp.zeros(F, jnp.int32),
        angle=jnp.zeros(F),
        desc=jnp.zeros((F, 8), jnp.uint32).at[:n].set(jnp.asarray(descs_q)),
        valid=jnp.zeros(F, bool).at[:n].set(jnp.asarray(vis)),
        u_right=jnp.full(F, -1.0), depth=jnp.full(F, -1.0))

    # brute matching alone is short of the 50-inlier bar
    st = sh.state
    P = st.mp_pos.shape[0]
    qmask = (st.kf_mp[slot] >= 0) & st.kf_feat_valid[slot]
    brute = matchers.match_brute(st.kf_desc[slot], qmask, q_feats.desc,
                                 q_feats.valid, th=CFG.matcher.th_low,
                                 nn_ratio=0.75)
    n_brute = int(jnp.sum(brute.ok))
    assert 15 <= n_brute < CFG.tracking.reloc_min_inliers, n_brute

    sys_.tracker.state = TrackerState.LOST
    ok = sys_._relocalize(q_feats)
    assert ok, "growth rounds should rescue the under-matched reloc"
    assert sys_.n_relocalizations == 1
    _, twc = se3.inverse(sys_.tracker.last_q, sys_.tracker.last_t)
    gt_q, gt_t = se3.inverse(q_cw, t_cw)
    err = np.linalg.norm(np.asarray(twc) - np.asarray(gt_t))
    assert err < 0.05, err
