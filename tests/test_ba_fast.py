"""Fast-path BA (E-major kernels + PCG) must match the reference formulation."""
import pytest

pytestmark = pytest.mark.e2e

import numpy as np
import jax.numpy as jnp

from multiagent_orb_slam2_tpu.optim.ba import ba_solve, ba_solve_fast
from test_ba import make_ba_problem, pose_rmse, CAM


def test_fast_matches_reference():
    prob, (q_gt, t_gt, pw_gt) = make_ba_problem(K=8, P=400, M=8)
    ref = ba_solve(prob, CAM, n_iters=10, chunk=100)
    fast = ba_solve_fast(prob, CAM, n_iters=10, chunk=100, pcg_iters=64)
    err_ref = pose_rmse(ref.q, ref.t, q_gt, t_gt)
    err_fast = pose_rmse(fast.q, fast.t, q_gt, t_gt)
    # both converge to the same ML optimum
    assert err_fast < max(1.3 * err_ref, 1.2e-2), (err_ref, err_fast)
    assert abs(float(fast.cost) - float(ref.cost)) / float(ref.cost) < 0.05


def test_fast_outlier_chi2_consistent():
    prob, _ = make_ba_problem(K=8, P=400, M=8, outlier_frac=0.2, seed=3)
    ref = ba_solve(prob, CAM, n_iters=8, chunk=100)
    fast = ba_solve_fast(prob, CAM, n_iters=8, chunk=100)
    ref_out = np.asarray(ref.obs_chi2 > 7.815) & np.asarray(prob.obs_mask)
    fast_out = np.asarray(fast.obs_chi2 > 7.815) & np.asarray(prob.obs_mask)
    # outlier labeling agrees on > 95% of observations
    agree = (ref_out == fast_out).mean()
    assert agree > 0.95, agree


def test_banded_matches_full():
    """Banded assembly (pose-window one-hot + host-classified exact overflow
    pass) must reproduce the full-width assembly, including when
    loop-closure-like points span distant poses (overflow path: the host
    wrapper sizes the overflow capacity from the true out-of-band count)."""
    from bench import build_problem
    prob, cam = build_problem(K=48, P=2048, M=4, seed=1)
    # make some points span distant poses (simulated loop closures): these
    # exceed the default 64-slot overflow bucket, exercising bucket growth
    obs_kf = np.array(prob.obs_kf)
    obs_kf[:96, -1] = (obs_kf[:96, -1] + 24) % 48
    prob = prob._replace(obs_kf=jnp.asarray(obs_kf))

    full = ba_solve_fast(prob, cam, n_iters=3, chunk=256, pcg_iters=48,
                         band=None)
    bnd = ba_solve_fast(prob, cam, n_iters=3, chunk=256, pcg_iters=48,
                        band=16)
    # banded sorts points by min observing pose, so summation order (and
    # f32 roundoff) differs; a single build agrees to ~1e-5 (verified
    # directly), and the deferred-accept LM amplifies that roundoff over
    # iterations — agreement is to solver-trajectory tolerance, not bitwise
    assert float(jnp.abs(full.q - bnd.q).max()) < 5e-3
    assert float(jnp.abs(full.t - bnd.t).max()) < 1e-2
    assert abs(float(full.cost) - float(bnd.cost)) / float(full.cost) < 1e-3


def test_fast_mono():
    prob, (q_gt, t_gt, _) = make_ba_problem(K=8, P=400, M=8, stereo=False,
                                            seed=1)
    prob = prob._replace(pose_fixed=prob.pose_fixed.at[1].set(True),
                         q=prob.q.at[1].set(q_gt[1]),
                         t=prob.t.at[1].set(t_gt[1]))
    fast = ba_solve_fast(prob, CAM, n_iters=12, chunk=100)
    assert pose_rmse(fast.q, fast.t, q_gt, t_gt) < 1.5e-2
