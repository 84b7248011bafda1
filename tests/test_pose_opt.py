"""Pose-only LM optimizer tests against synthetic ground truth."""
import numpy as np
import jax.numpy as jnp

from multiagent_orb_slam2_tpu.config import OptimizerConfig
from multiagent_orb_slam2_tpu.geometry import se3
from multiagent_orb_slam2_tpu.geometry.camera import Intrinsics
from multiagent_orb_slam2_tpu.optim.pose_opt import PoseObs, pose_optimize

CAM = Intrinsics(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=45.0)


def make_problem(n=200, stereo=True, noise=0.5, outlier_frac=0.0, seed=0,
                 pose_err=0.05):
    rng = np.random.default_rng(seed)
    pw = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                   rng.uniform(4, 15, n)], axis=-1)
    q_true, t_true = se3.se3_exp(jnp.asarray(rng.normal(size=6) * 0.1))
    pc = np.asarray(se3.apply(q_true, t_true, jnp.asarray(pw)))
    u = CAM.fx * pc[:, 0] / pc[:, 2] + CAM.cx
    v = CAM.fy * pc[:, 1] / pc[:, 2] + CAM.cy
    ur = u - CAM.bf / pc[:, 2]
    obs = np.stack([u, v, ur], axis=-1) + rng.normal(0, noise, (n, 3))
    n_out = int(n * outlier_frac)
    if n_out:
        obs[:n_out, :2] += rng.uniform(20, 80, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    p_obs = PoseObs(
        pw=jnp.asarray(pw, jnp.float32),
        obs=jnp.asarray(obs, jnp.float32),
        inv_sigma2=jnp.ones(n, jnp.float32),
        is_stereo=jnp.full(n, stereo),
        mask=jnp.ones(n, bool),
    )
    # start from a perturbed pose
    dq, dt = se3.se3_exp(jnp.asarray(rng.normal(size=6) * pose_err))
    q0, t0 = se3.compose(dq, dt, q_true, t_true)
    return q0, t0, q_true, t_true, p_obs


def pose_error(q, t, q_true, t_true):
    dq, dt = se3.relative(q, t, q_true, t_true)
    return float(jnp.linalg.norm(se3.se3_log(dq, dt)))


class TestPoseOptimize:
    def test_converges_clean(self):
        q0, t0, qt, tt, obs = make_problem(noise=0.3)
        q, t, inl, n = pose_optimize(q0, t0, obs, CAM)
        assert pose_error(q, t, qt, tt) < 5e-3
        assert int(n) > 190

    def test_converges_mono(self):
        q0, t0, qt, tt, obs = make_problem(stereo=False, noise=0.3)
        q, t, inl, n = pose_optimize(q0, t0, obs, CAM)
        assert pose_error(q, t, qt, tt) < 1e-2
        assert int(n) > 180

    def test_robust_to_outliers(self):
        q0, t0, qt, tt, obs = make_problem(noise=0.3, outlier_frac=0.3, seed=3)
        q, t, inl, n = pose_optimize(q0, t0, obs, CAM)
        assert pose_error(q, t, qt, tt) < 1e-2
        # outliers (first 30%) must be labeled out
        inl = np.asarray(inl)
        assert inl[:60].sum() < 10
        assert inl[60:].sum() > 120

    def test_large_initial_error(self):
        q0, t0, qt, tt, obs = make_problem(noise=0.2, pose_err=0.25, seed=4)
        q, t, inl, n = pose_optimize(q0, t0, obs, CAM)
        assert pose_error(q, t, qt, tt) < 1e-2

    def test_masked_obs_ignored(self):
        q0, t0, qt, tt, obs = make_problem(noise=0.2, seed=5)
        # corrupt half the observations but mask them out
        bad_obs = np.asarray(obs.obs).copy()
        bad_obs[:100] += 500.0
        mask = np.ones(200, bool)
        mask[:100] = False
        obs2 = obs._replace(obs=jnp.asarray(bad_obs), mask=jnp.asarray(mask))
        q, t, inl, n = pose_optimize(q0, t0, obs2, CAM)
        assert pose_error(q, t, qt, tt) < 1e-2
        assert int(n) <= 100
