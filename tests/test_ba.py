"""Schur-complement bundle adjustment tests on synthetic problems."""
import pytest

pytestmark = pytest.mark.e2e

import numpy as np
import jax.numpy as jnp

from multiagent_orb_slam2_tpu.geometry import se3
from multiagent_orb_slam2_tpu.geometry.camera import Intrinsics
from multiagent_orb_slam2_tpu.optim.ba import BAProblem, ba_solve, outlier_mask

CAM = Intrinsics(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=45.0)


def make_ba_problem(K=8, P=400, M=8, stereo=True, noise=0.4,
                    pose_pert=0.02, point_pert=0.05, seed=0,
                    outlier_frac=0.0):
    """Cameras on a line looking +z at a point cloud ahead of them."""
    rng = np.random.default_rng(seed)
    # ground-truth camera-to-world: spread along x
    t_wc = np.stack([np.linspace(0, 2.0, K), np.zeros(K), np.zeros(K)], -1)
    q_wc = np.tile(np.array([1.0, 0, 0, 0]), (K, 1))
    # world-to-camera
    q_gt, t_gt = se3.inverse(jnp.asarray(q_wc, jnp.float32),
                             jnp.asarray(t_wc, jnp.float32))
    pw_gt = np.stack([rng.uniform(-3, 5, P), rng.uniform(-2, 2, P),
                      rng.uniform(5, 15, P)], -1).astype(np.float32)

    # observations: each point observed by M random cameras (dedup'd)
    obs_kf = np.full((P, M), -1, np.int32)
    obs_uvr = np.zeros((P, M, 3), np.float32)
    obs_mask = np.zeros((P, M), bool)
    n_out = int(P * outlier_frac)
    for p in range(P):
        ks = rng.choice(K, size=min(M, K), replace=False)
        for m, k in enumerate(ks):
            pc = np.asarray(se3.apply(q_gt[k], t_gt[k], jnp.asarray(pw_gt[p])))
            if pc[2] < 0.5:
                continue
            u = CAM.fx * pc[0] / pc[2] + CAM.cx
            v = CAM.fy * pc[1] / pc[2] + CAM.cy
            if not (0 <= u < 640 and 0 <= v < 480):
                continue
            ur = u - CAM.bf / pc[2]
            o = np.array([u, v, ur]) + rng.normal(0, noise, 3)
            if p < n_out and m == 0:
                o[:2] += 60.0
            obs_kf[p, m] = k
            obs_uvr[p, m] = o
            obs_mask[p, m] = True

    # perturb initial estimates (pose 0 fixed as gauge anchor)
    q0, t0 = [], []
    for k in range(K):
        if k == 0:
            q0.append(np.asarray(q_gt[k])), t0.append(np.asarray(t_gt[k]))
            continue
        dq, dt = se3.se3_exp(jnp.asarray(rng.normal(size=6) * pose_pert))
        qq, tt = se3.compose(dq, dt, q_gt[k], t_gt[k])
        q0.append(np.asarray(qq)), t0.append(np.asarray(tt))
    pw0 = pw_gt + rng.normal(0, point_pert, (P, 3)).astype(np.float32)

    prob = BAProblem(
        q=jnp.asarray(np.stack(q0), jnp.float32),
        t=jnp.asarray(np.stack(t0), jnp.float32),
        pose_valid=jnp.ones(K, bool),
        pose_fixed=jnp.zeros(K, bool).at[0].set(True),
        pw=jnp.asarray(pw0),
        point_valid=jnp.ones(P, bool),
        obs_kf=jnp.asarray(obs_kf),
        obs_uvr=jnp.asarray(obs_uvr),
        obs_inv_sigma2=jnp.ones((P, M), jnp.float32),
        obs_stereo=jnp.full((P, M), stereo),
        obs_mask=jnp.asarray(obs_mask),
    )
    return prob, (q_gt, t_gt, jnp.asarray(pw_gt))


def pose_rmse(q, t, q_gt, t_gt):
    dq, dt = se3.relative(q, t, q_gt, t_gt)
    return float(jnp.sqrt(jnp.mean(jnp.sum(se3.se3_log(dq, dt) ** 2, -1))))


class TestBA:
    def test_converges_stereo(self):
        prob, (q_gt, t_gt, pw_gt) = make_ba_problem()
        res = ba_solve(prob, CAM, n_iters=10, chunk=100)
        err0 = pose_rmse(prob.q, prob.t, q_gt, t_gt)
        err1 = pose_rmse(res.q, res.t, q_gt, t_gt)
        # err floor is the ML optimum at 0.4 px obs noise (~1e-2 twist RMSE)
        assert err1 < err0 * 0.3, (err0, err1)
        assert err1 < 1.2e-2
        # points recover too
        # point floor: depth sigma at 10 m with 0.4 px noise is ~0.5 m for a
        # single stereo obs; multi-view brings RMSE to a few cm
        pt_err0 = float(jnp.sqrt(jnp.mean(jnp.sum((prob.pw - pw_gt) ** 2, -1))))
        pt_err = float(jnp.sqrt(jnp.mean(jnp.sum((res.pw - pw_gt) ** 2, -1))))
        assert pt_err < max(pt_err0, 0.08)

    def test_converges_mono(self):
        prob, (q_gt, t_gt, pw_gt) = make_ba_problem(stereo=False, seed=1)
        # mono: fix two poses to pin scale gauge
        prob = prob._replace(pose_fixed=prob.pose_fixed.at[1].set(True),
                             q=prob.q.at[1].set(q_gt[1]),
                             t=prob.t.at[1].set(t_gt[1]))
        res = ba_solve(prob, CAM, n_iters=12, chunk=100)
        err1 = pose_rmse(res.q, res.t, q_gt, t_gt)
        assert err1 < 1.5e-2

    def test_fixed_pose_untouched(self):
        prob, _ = make_ba_problem(seed=2)
        res = ba_solve(prob, CAM, n_iters=5, chunk=100)
        np.testing.assert_array_equal(res.q[0], prob.q[0])
        np.testing.assert_array_equal(res.t[0], prob.t[0])

    def test_outlier_detection(self):
        prob, (q_gt, t_gt, _) = make_ba_problem(outlier_frac=0.2, seed=3)
        res = ba_solve(prob, CAM, n_iters=10, chunk=100)
        keep = np.asarray(outlier_mask(res, prob))
        obs_mask = np.asarray(prob.obs_mask)
        # outliers were injected at slot m=0 of first 20% points
        P = obs_mask.shape[0]
        n_out = int(P * 0.2)
        injected = obs_mask[:n_out, 0]
        dropped = injected & ~keep[:n_out, 0]
        assert dropped.sum() > 0.9 * injected.sum()
        # second stage without the culled outliers (the reference's local-BA
        # schedule: optimize, erase chi2 outliers, optimize again —
        # src/Optimizer.cc:693-746); pose accuracy then reaches the floor
        prob2 = prob._replace(q=res.q, t=res.t, pw=res.pw,
                              obs_mask=jnp.asarray(keep))
        res2 = ba_solve(prob2, CAM, n_iters=10, chunk=100)
        assert pose_rmse(res2.q, res2.t, q_gt, t_gt) < 1.2e-2

    def test_cost_decreases(self):
        prob, _ = make_ba_problem(pose_pert=0.05, point_pert=0.2, seed=4)
        res5 = ba_solve(prob, CAM, n_iters=3, chunk=100)
        res10 = ba_solve(prob, CAM, n_iters=12, chunk=100)
        assert float(res10.cost) <= float(res5.cost)
