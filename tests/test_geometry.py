"""Golden tests for the SE3/Sim3/camera substrate."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiagent_orb_slam2_tpu.geometry import se3, sim3, camera


def rand_quat(rng, shape=()):
    q = rng.normal(size=shape + (4,))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(np.where(q[..., :1] < 0, -q, q))


class TestQuat:
    def test_mul_matches_matrix(self):
        rng = np.random.default_rng(0)
        qa, qb = rand_quat(rng, (16,)), rand_quat(rng, (16,))
        Rab = se3.quat_to_matrix(se3.quat_mul(qa, qb))
        Ra, Rb = se3.quat_to_matrix(qa), se3.quat_to_matrix(qb)
        np.testing.assert_allclose(Rab, Ra @ Rb, atol=1e-5)

    def test_rotate_matches_matrix(self):
        rng = np.random.default_rng(1)
        q = rand_quat(rng, (8,))
        v = jnp.asarray(rng.normal(size=(8, 3)))
        np.testing.assert_allclose(
            se3.quat_rotate(q, v),
            jnp.einsum("...ij,...j->...i", se3.quat_to_matrix(q), v),
            atol=1e-5,
        )

    def test_matrix_roundtrip(self):
        rng = np.random.default_rng(2)
        q = rand_quat(rng, (32,))
        q2 = se3.matrix_to_quat(se3.quat_to_matrix(q))
        np.testing.assert_allclose(q, q2, atol=1e-5)

    def test_matrix_roundtrip_near_pi(self):
        # 180-degree rotations stress Shepperd branch selection
        for axis in np.eye(3):
            w = jnp.asarray(axis * (np.pi - 1e-3))
            q = se3.so3_exp_quat(w)
            q2 = se3.matrix_to_quat(se3.quat_to_matrix(q))
            np.testing.assert_allclose(np.abs(np.dot(q, q2)), 1.0, atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(3)
        xi = jnp.asarray(rng.normal(size=(64, 6)) * 0.7)
        q, t = se3.se3_exp(xi)
        xi2 = se3.se3_log(q, t)
        np.testing.assert_allclose(xi, xi2, atol=1e-4)

    def test_exp_small_angle(self):
        xi = jnp.asarray([1e-9, -2e-9, 1e-9, 1e-10, 0.0, -1e-10])
        q, t = se3.se3_exp(xi)
        np.testing.assert_allclose(t, xi[:3], atol=1e-8)
        np.testing.assert_allclose(q[0], 1.0, atol=1e-8)

    def test_compose_inverse(self):
        rng = np.random.default_rng(4)
        q, t = se3.se3_exp(jnp.asarray(rng.normal(size=(16, 6))))
        qi, ti = se3.inverse(q, t)
        qc, tc = se3.compose(q, t, qi, ti)
        np.testing.assert_allclose(np.abs(qc[..., 0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(tc, 0.0, atol=1e-5)

    def test_apply_matches_matrix44(self):
        rng = np.random.default_rng(5)
        q, t = se3.se3_exp(jnp.asarray(rng.normal(size=(8, 6))))
        p = jnp.asarray(rng.normal(size=(8, 3)))
        T = se3.to_matrix44(q, t)
        ph = jnp.concatenate([p, jnp.ones((8, 1))], axis=-1)
        np.testing.assert_allclose(
            se3.apply(q, t, p), jnp.einsum("...ij,...j->...i", T, ph)[..., :3],
            atol=1e-5)

    def test_from_matrix44_roundtrip(self):
        rng = np.random.default_rng(6)
        q, t = se3.se3_exp(jnp.asarray(rng.normal(size=(8, 6))))
        q2, t2 = se3.from_matrix44(se3.to_matrix44(q, t))
        np.testing.assert_allclose(q, q2, atol=1e-5)
        np.testing.assert_allclose(t, t2, atol=1e-5)


class TestSim3:
    def test_compose_apply(self):
        rng = np.random.default_rng(7)
        s1 = jnp.asarray(np.exp(rng.normal(size=(8,)) * 0.3))
        q1 = rand_quat(rng, (8,))
        t1 = jnp.asarray(rng.normal(size=(8, 3)))
        s2 = jnp.asarray(np.exp(rng.normal(size=(8,)) * 0.3))
        q2 = rand_quat(rng, (8,))
        t2 = jnp.asarray(rng.normal(size=(8, 3)))
        p = jnp.asarray(rng.normal(size=(8, 3)))
        sc, qc, tc = sim3.compose(s1, q1, t1, s2, q2, t2)
        np.testing.assert_allclose(
            sim3.apply(sc, qc, tc, p),
            sim3.apply(s1, q1, t1, sim3.apply(s2, q2, t2, p)),
            atol=1e-4)

    def test_inverse(self):
        rng = np.random.default_rng(8)
        s = jnp.asarray(np.exp(rng.normal(size=(8,)) * 0.3))
        q = rand_quat(rng, (8,))
        t = jnp.asarray(rng.normal(size=(8, 3)))
        si, qi, ti = sim3.inverse(s, q, t)
        p = jnp.asarray(rng.normal(size=(8, 3)))
        np.testing.assert_allclose(
            sim3.apply(si, qi, ti, sim3.apply(s, q, t, p)), p, atol=1e-4)

    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(9)
        xi = jnp.asarray(rng.normal(size=(32, 7)) * 0.5)
        s, q, t = sim3.exp(xi)
        xi2 = sim3.log(s, q, t)
        np.testing.assert_allclose(xi, xi2, atol=1e-3)

    def test_exp_identity(self):
        s, q, t = sim3.exp(jnp.zeros((7,)))
        np.testing.assert_allclose(s, 1.0, atol=1e-6)
        np.testing.assert_allclose(q, [1, 0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(t, 0.0, atol=1e-6)

    def test_exp_pure_scale(self):
        xi = jnp.zeros((7,)).at[6].set(0.7)
        s, q, t = sim3.exp(xi)
        np.testing.assert_allclose(s, np.exp(0.7), rtol=1e-5)
        xi2 = sim3.log(s, q, t)
        np.testing.assert_allclose(xi, xi2, atol=1e-5)


class TestCamera:
    CAM = camera.Intrinsics(fx=500.0, fy=505.0, cx=320.0, cy=240.0, bf=200.0,
                            width=640, height=480)

    def test_project_backproject(self):
        rng = np.random.default_rng(10)
        depth = jnp.asarray(rng.uniform(1.0, 20.0, size=(32,)))
        uv = jnp.asarray(rng.uniform(0, 640, size=(32, 2)))
        pc = camera.backproject(self.CAM, uv, depth)
        uv2 = camera.project(self.CAM, pc)
        np.testing.assert_allclose(uv, uv2, atol=1e-4)

    def test_stereo_disparity_positive(self):
        pc = jnp.asarray([[0.5, 0.2, 5.0]])
        uvr = camera.project_stereo(self.CAM, pc)
        assert uvr[0, 2] < uvr[0, 0]  # right x < left x
        np.testing.assert_allclose(uvr[0, 0] - uvr[0, 2], 200.0 / 5.0, atol=1e-5)

    def test_unproject_world_roundtrip(self):
        rng = np.random.default_rng(11)
        q, t = se3.se3_exp(jnp.asarray(rng.normal(size=(6,)) * 0.2))
        uv = jnp.asarray(rng.uniform(100, 500, size=(16, 2)))
        depth = jnp.asarray(rng.uniform(2.0, 10.0, size=(16,)))
        pw = camera.unproject_world(self.CAM, q, t, uv, depth)
        uv2, z2 = camera.project_world(self.CAM, q, t, pw)
        np.testing.assert_allclose(uv, uv2, atol=1e-3)
        np.testing.assert_allclose(depth, z2, atol=1e-4)

    def test_undistort_roundtrip(self):
        cam = self.CAM._replace(dist=(-0.28, 0.07, 1e-4, -2e-5, 0.0))
        rng = np.random.default_rng(12)
        uv_true = jnp.asarray(rng.uniform(200, 440, size=(16, 2)))
        xy = jnp.stack([(uv_true[:, 0] - cam.cx) / cam.fx,
                        (uv_true[:, 1] - cam.cy) / cam.fy], axis=-1)
        xyd = camera.distort(cam, xy)
        uv_dist = jnp.stack([xyd[:, 0] * cam.fx + cam.cx,
                             xyd[:, 1] * cam.fy + cam.cy], axis=-1)
        uv_und = camera.undistort_points(cam, uv_dist, iters=8)
        np.testing.assert_allclose(uv_und, uv_true, atol=0.05)
