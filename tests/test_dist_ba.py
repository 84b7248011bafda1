"""Distributed (point-sharded) BA on the virtual 8-device CPU mesh."""
import pytest

pytestmark = pytest.mark.e2e

import numpy as np
import jax
import jax.numpy as jnp

from multiagent_orb_slam2_tpu.parallel import dist_ba
from multiagent_orb_slam2_tpu.optim.ba import ba_solve
from test_ba import make_ba_problem, pose_rmse, CAM


def test_matches_single_device_ba():
    prob, (q_gt, t_gt, pw_gt) = make_ba_problem(K=8, P=400, M=8)
    mesh = dist_ba.make_mesh(8)
    q, t, pw = dist_ba.distributed_ba_solve(prob, CAM, mesh, n_iters=10)
    err = pose_rmse(q, t, q_gt, t_gt)
    # same ML floor as the single-device solver
    ref = ba_solve(prob, CAM, n_iters=10, chunk=100)
    err_ref = pose_rmse(ref.q, ref.t, q_gt, t_gt)
    assert err < max(1.5 * err_ref, 1.2e-2), (err, err_ref)


def test_sharded_execution_uses_all_devices():
    prob, _ = make_ba_problem(K=8, P=400, M=8, seed=7)
    mesh = dist_ba.make_mesh(4)
    q, t, pw = dist_ba.distributed_ba_solve(prob, CAM, mesh, n_iters=3)
    assert pw.shape == prob.pw.shape
    assert np.isfinite(np.asarray(q)).all()
