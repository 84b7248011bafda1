"""Stereo/RGB-D frame construction tests on ray-cast synthetic scenes."""
import numpy as np
import jax.numpy as jnp
import pytest

from multiagent_orb_slam2_tpu.config import SlamConfig, OrbConfig, Capacities
from multiagent_orb_slam2_tpu.io.synthetic import BoxScene, DEFAULT_CAM
from multiagent_orb_slam2_tpu.ops import frame as frame_mod


CFG = SlamConfig(camera=DEFAULT_CAM,
                 orb=OrbConfig(n_features=500, n_levels=4),
                 caps=Capacities(max_features=512))


@pytest.fixture(scope="module")
def scene_render():
    scene = BoxScene(seed=3)
    q = np.array([1.0, 0.0, 0.0, 0.0])
    t = np.zeros(3)
    left, right, depth = scene.render_stereo(CFG.camera, q, t)
    return left, right, depth


def test_stereo_depth_accuracy(scene_render):
    left, right, depth = scene_render
    feats = frame_mod.extract_frame(jnp.asarray(left), CFG,
                                    right_img=jnp.asarray(right))
    d_est = np.asarray(feats.depth)
    xy = np.asarray(feats.xy)
    good = np.asarray(feats.valid) & (d_est > 0)
    assert good.sum() > 100, f"only {good.sum()} stereo matches"
    xi = np.clip(np.round(xy[good, 0]).astype(int), 0, 639)
    yi = np.clip(np.round(xy[good, 1]).astype(int), 0, 479)
    d_true = depth[yi, xi]
    rel = np.abs(d_est[good] - d_true) / d_true
    # half the matches within 5% depth error, median tight
    assert np.median(rel) < 0.05, f"median depth rel err {np.median(rel):.3f}"


def test_rgbd_depth_exact(scene_render):
    left, _, depth = scene_render
    feats = frame_mod.extract_frame(jnp.asarray(left), CFG,
                                    depth_map=jnp.asarray(depth))
    d_est = np.asarray(feats.depth)
    good = np.asarray(feats.valid) & (d_est > 0)
    assert good.sum() > 200
    xy = np.asarray(feats.xy)
    xi = np.clip(np.round(xy[good, 0]).astype(int), 0, 639)
    yi = np.clip(np.round(xy[good, 1]).astype(int), 0, 479)
    np.testing.assert_allclose(d_est[good], depth[yi, xi], rtol=1e-5)
    # u_right consistent with depth: u - bf/d
    ur = np.asarray(feats.u_right)[good]
    np.testing.assert_allclose(ur, xy[good, 0] - CFG.camera.bf / d_est[good],
                               atol=1e-3)


def test_features_in_area():
    left = BoxScene(seed=4).render(CFG.camera, np.array([1.0, 0, 0, 0]),
                                   np.zeros(3))[0]
    feats = frame_mod.extract_frame(jnp.asarray(left), CFG)
    centers = np.asarray(feats.xy)[:3]
    m = np.asarray(frame_mod.features_in_area(feats, jnp.asarray(centers), 20.0))
    assert m.shape == (3, 512)
    xy = np.asarray(feats.xy)
    for i in range(3):
        inside = (np.abs(xy[:, 0] - centers[i, 0]) < 20) \
            & (np.abs(xy[:, 1] - centers[i, 1]) < 20) & np.asarray(feats.valid)
        np.testing.assert_array_equal(m[i], inside)
