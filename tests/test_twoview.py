"""Two-view monocular initializer tests (general motion -> F path,
planar scene -> H path)."""
import numpy as np
import jax
import jax.numpy as jnp

from multiagent_orb_slam2_tpu.geometry import se3, twoview
from multiagent_orb_slam2_tpu.geometry.camera import Intrinsics

CAM = Intrinsics(fx=450.0, fy=450.0, cx=320.0, cy=240.0)


def project(q, t, pw):
    pc = np.asarray(se3.apply(q, t, jnp.asarray(pw)))
    u = CAM.fx * pc[:, 0] / pc[:, 2] + CAM.cx
    v = CAM.fy * pc[:, 1] / pc[:, 2] + CAM.cy
    return np.stack([u, v], -1), pc[:, 2]


def make_pair(planar=False, n=300, noise=0.4, outlier_frac=0.1, seed=0,
              baseline=(0.4, 0.05, 0.1), rot=0.03):
    rng = np.random.default_rng(seed)
    if planar:
        # points on a plane z = 6 + 0.3x + 0.2y
        xy = rng.uniform(-4, 4, size=(n, 2))
        z = 6.0 + 0.3 * xy[:, 0] + 0.2 * xy[:, 1]
        pw = np.concatenate([xy, z[:, None]], -1)
    else:
        pw = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                       rng.uniform(4, 12, n)], -1)
    q1 = jnp.array([1.0, 0, 0, 0])
    t1 = jnp.zeros(3)
    q2, t2 = se3.se3_exp(jnp.asarray(list(baseline) + [rot, -rot, rot * 0.5]))
    x1, z1 = project(q1, t1, pw)
    x2, z2 = project(q2, t2, pw)
    ok = (z1 > 0.1) & (z2 > 0.1) \
        & (x1 > 0).all(-1) & (x1 < [640, 480]).all(-1) \
        & (x2 > 0).all(-1) & (x2 < [640, 480]).all(-1)
    x1 += rng.normal(0, noise, x1.shape)
    x2 += rng.normal(0, noise, x2.shape)
    n_out = int(n * outlier_frac)
    x2[:n_out] = rng.uniform(0, [640, 480], size=(n_out, 2))
    return (jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32),
            jnp.asarray(ok), (q2, t2))


def check_motion(res, q_gt, t_gt, atol_rot=0.02, atol_dir=0.05):
    assert bool(res.ok)
    # rotation error
    dq = se3.quat_mul(se3.quat_conj(res.q), q_gt)
    rot_err = float(jnp.linalg.norm(se3.so3_log(dq)))
    assert rot_err < atol_rot, rot_err
    # translation direction (scale-free)
    t_dir = np.asarray(res.t) / np.linalg.norm(np.asarray(res.t))
    g_dir = np.asarray(t_gt) / np.linalg.norm(np.asarray(t_gt))
    assert np.linalg.norm(t_dir - g_dir) < atol_dir, (t_dir, g_dir)


class TestTwoView:
    def test_general_scene_uses_f(self):
        x1, x2, mask, (q_gt, t_gt) = make_pair(planar=False, seed=1)
        res = twoview.initialize_two_view(x1, x2, mask, CAM,
                                          jax.random.PRNGKey(0))
        assert not bool(res.used_homography)
        check_motion(res, q_gt, t_gt)

    def test_planar_scene_uses_h(self):
        x1, x2, mask, (q_gt, t_gt) = make_pair(planar=True, seed=2)
        res = twoview.initialize_two_view(x1, x2, mask, CAM,
                                          jax.random.PRNGKey(1))
        assert bool(res.used_homography)
        check_motion(res, q_gt, t_gt)

    def test_triangulated_points_consistent(self):
        x1, x2, mask, (q_gt, t_gt) = make_pair(planar=False, seed=3,
                                               outlier_frac=0.0)
        res = twoview.initialize_two_view(x1, x2, mask, CAM,
                                          jax.random.PRNGKey(2))
        assert bool(res.ok)
        inl = np.asarray(res.inliers)
        assert inl.sum() > 150
        # reproject triangulated points into cam1: must match x1
        X = np.asarray(res.points)[inl]
        u = CAM.fx * X[:, 0] / X[:, 2] + CAM.cx
        v = CAM.fy * X[:, 1] / X[:, 2] + CAM.cy
        err = np.linalg.norm(np.stack([u, v], -1) - np.asarray(x1)[inl], axis=-1)
        assert np.median(err) < 1.5

    def test_pure_rotation_rejected(self):
        x1, x2, mask, _ = make_pair(planar=False, seed=4,
                                    baseline=(0.0, 0.0, 0.0), rot=0.05,
                                    outlier_frac=0.0)
        res = twoview.initialize_two_view(x1, x2, mask, CAM,
                                          jax.random.PRNGKey(3))
        assert not bool(res.ok)  # no parallax -> must not initialize
