"""Triangulation step test: epipolar matching + DLT between two fabricated
keyframes recovers the withheld 3D points."""
import numpy as np
import jax.numpy as jnp

from multiagent_orb_slam2_tpu.config import SlamConfig, OrbConfig, Capacities
from multiagent_orb_slam2_tpu.geometry import se3
from multiagent_orb_slam2_tpu.geometry.camera import Intrinsics
from multiagent_orb_slam2_tpu.mapstate import state as ms
from multiagent_orb_slam2_tpu.ops.frame import FrameFeatures
from multiagent_orb_slam2_tpu.runtime import steps

CAM = Intrinsics(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=45.0)
CFG = SlamConfig(camera=CAM, orb=OrbConfig(n_features=256, n_levels=4),
                 caps=Capacities(max_keyframes=8, max_points=1024,
                                 max_features=256, local_points=512))


def fabricate_kf(state, slot, q, t, pw_vis, descs, rng, noise=0.3):
    """Insert a keyframe observing pw_vis (no map point assignment)."""
    F = CFG.caps.max_features
    pc = np.asarray(se3.apply(q, t, jnp.asarray(pw_vis)))
    u = CAM.fx * pc[:, 0] / pc[:, 2] + CAM.cx + rng.normal(0, noise, len(pc))
    v = CAM.fy * pc[:, 1] / pc[:, 2] + CAM.cy + rng.normal(0, noise, len(pc))
    n = len(pc)
    feats = FrameFeatures(
        xy=jnp.zeros((F, 2)).at[:n].set(jnp.asarray(np.stack([u, v], -1))),
        response=jnp.zeros(F),
        level=jnp.zeros(F, jnp.int32),
        angle=jnp.zeros(F),
        desc=jnp.zeros((F, 8), jnp.uint32).at[:n].set(jnp.asarray(descs)),
        valid=jnp.zeros(F, bool).at[:n].set(True),
        u_right=jnp.full(F, -1.0),
        depth=jnp.full(F, -1.0))
    return ms.insert_keyframe(state, slot, feats, q, t, slot, 0, 0,
                              jnp.full((F,), -1, jnp.int32), parent=-1)


def fabricate_stereo_kf(state, cfg, slot, q, t, pw_vis, descs, rng,
                        noise=0.3):
    """Insert a keyframe with STEREO features (u_right + depth set) for
    every visible point — the LocalMapping::CreateNewMapPoints input shape
    for stereo/RGB-D sensors (src/LocalMapping.cc:213-458)."""
    cam = cfg.camera
    F = cfg.caps.max_features
    pc = np.asarray(se3.apply(q, t, jnp.asarray(pw_vis)))
    z = pc[:, 2]
    u = cam.fx * pc[:, 0] / z + cam.cx + rng.normal(0, noise, len(pc))
    v = cam.fy * pc[:, 1] / z + cam.cy + rng.normal(0, noise, len(pc))
    n = len(pc)
    feats = FrameFeatures(
        xy=jnp.zeros((F, 2)).at[:n].set(jnp.asarray(np.stack([u, v], -1))),
        response=jnp.zeros(F),
        level=jnp.zeros(F, jnp.int32),
        angle=jnp.zeros(F),
        desc=jnp.zeros((F, 8), jnp.uint32).at[:n].set(jnp.asarray(descs)),
        valid=jnp.zeros(F, bool).at[:n].set(True),
        u_right=jnp.full(F, -1.0).at[:n].set(jnp.asarray(u - cam.bf / z)),
        depth=jnp.full(F, -1.0).at[:n].set(jnp.asarray(z)))
    return ms.insert_keyframe(state, slot, feats, q, t, slot, 0, 0,
                              jnp.full((F,), -1, jnp.int32), parent=-1)


def test_triangulate_far_points_stereo():
    """Far structure (beyond the stereo-reliable ThDepth band) must come
    from multi-view triangulation — the purpose of running
    CreateNewMapPoints for stereo sensors (src/LocalMapping.cc:213-458).
    Two stereo-featured KFs 0.8 m apart, 72 of 120 points at z in [40, 80]
    (rig baseline 0.5 m, so stereo parallax is weaker than the two-view
    parallax there): the far points must be created and accurate."""
    from multiagent_orb_slam2_tpu.config import Sensor
    cam = Intrinsics(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=225.0)
    cfg = SlamConfig(camera=cam, sensor=Sensor.STEREO,
                     orb=OrbConfig(n_features=256, n_levels=4),
                     caps=Capacities(max_keyframes=8, max_points=1024,
                                     max_features=256, local_points=512))
    rng = np.random.default_rng(0)
    z = np.concatenate([rng.uniform(5, 40, 48), rng.uniform(40, 80, 72)])
    pw = np.stack([rng.uniform(-0.3, 0.3, 120) * z,
                   rng.uniform(-0.2, 0.2, 120) * z, z], -1).astype(np.float32)
    descs = rng.integers(0, 2**32, (120, 8), dtype=np.uint32)
    q1 = jnp.array([1.0, 0, 0, 0])
    t1 = jnp.zeros(3)
    q2, t2 = se3.inverse(*se3.se3_exp(jnp.asarray([0.8, 0.0, 0.0,
                                                   0.0, 0.0, 0.0])))
    st = ms.empty_map_state(cfg)
    st = fabricate_stereo_kf(st, cfg, 0, q1, t1, pw, descs, rng)
    st = fabricate_stereo_kf(st, cfg, 1, q2, t2, pw, descs, rng)
    st, n_new = steps.triangulate_pair_step(st, 0, 1, 0, cfg)
    created = np.asarray(st.mp_valid)
    est = np.asarray(st.mp_pos)[created]
    far = est[est[:, 2] >= 40]
    assert int(n_new) >= 100, int(n_new)
    assert len(far) >= 60, len(far)      # the far structure materializes
    # far points land near ground truth (two-view accuracy, not the
    # noise-amplified stereo depth)
    gt_far = pw[pw[:, 2] >= 40]
    d = np.linalg.norm(far[:, None] - gt_far[None], axis=-1).min(1)
    assert np.median(d) < 3.0, np.median(d)


def test_triangulate_stereo_depth_fallback():
    """When the two keyframes are nearly co-located (two-view parallax
    weaker than the rig's own stereo parallax), points must fall back to
    stereo-depth unprojection instead of degenerate DLT
    (src/LocalMapping.cc:314-344)."""
    from multiagent_orb_slam2_tpu.config import Sensor
    cam = Intrinsics(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=225.0)
    cfg = SlamConfig(camera=cam, sensor=Sensor.STEREO,
                     orb=OrbConfig(n_features=256, n_levels=4),
                     caps=Capacities(max_keyframes=8, max_points=1024,
                                     max_features=256, local_points=512))
    rng = np.random.default_rng(1)
    n = 80
    z = rng.uniform(5, 15, n)            # close points, good stereo depth
    pw = np.stack([rng.uniform(-0.3, 0.3, n) * z,
                   rng.uniform(-0.2, 0.2, n) * z, z], -1).astype(np.float32)
    descs = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    q1 = jnp.array([1.0, 0, 0, 0])
    t1 = jnp.zeros(3)
    # 2 cm apart: way below the 0.5 m rig baseline
    q2, t2 = se3.inverse(*se3.se3_exp(jnp.asarray([0.02, 0.0, 0.0,
                                                   0.0, 0.0, 0.0])))
    st = ms.empty_map_state(cfg)
    st = fabricate_stereo_kf(st, cfg, 0, q1, t1, pw, descs, rng, noise=0.1)
    st = fabricate_stereo_kf(st, cfg, 1, q2, t2, pw, descs, rng, noise=0.1)
    st, n_new = steps.triangulate_pair_step(st, 0, 1, 0, cfg)
    assert int(n_new) >= 60, int(n_new)
    est = np.asarray(st.mp_pos)[np.asarray(st.mp_valid)]
    d = np.linalg.norm(est[:, None] - pw[None], axis=-1).min(1)
    # depth-unprojection accuracy, not DLT blowup from 2 cm parallax
    assert np.median(d) < 0.5, np.median(d)


def test_triangulate_pair():
    rng = np.random.default_rng(0)
    n = 120
    pw = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                   rng.uniform(5, 12, n)], -1).astype(np.float32)
    descs = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)

    q1 = jnp.array([1.0, 0, 0, 0]); t1 = jnp.zeros(3)
    q2, t2 = se3.inverse(*se3.se3_exp(jnp.asarray([0.6, 0.05, 0.0,
                                                   0.0, 0.04, 0.0])))
    st = ms.empty_map_state(CFG)
    st = fabricate_kf(st, 0, q1, t1, pw, descs, rng)
    st = fabricate_kf(st, 1, q2, t2, pw, descs, rng)

    st, n_new = steps.triangulate_pair_step(st, 0, 1, 0, CFG)
    n_new = int(n_new)
    assert n_new > 80, n_new
    # triangulated points close to ground truth
    created = np.asarray(st.mp_valid)
    est = np.asarray(st.mp_pos)[created]
    # match each created point to nearest GT
    d = np.linalg.norm(est[:, None] - pw[None], axis=-1).min(1)
    assert np.median(d) < 0.12, np.median(d)  # noise floor ~0.06 at z=5-12m
    # observations registered in both KFs
    kf_mp = np.asarray(st.kf_mp)
    assert (kf_mp[0] >= 0).sum() >= n_new
    assert (kf_mp[1] >= 0).sum() >= n_new
    covis = np.asarray(st.covis)
    assert covis[0, 1] >= n_new
