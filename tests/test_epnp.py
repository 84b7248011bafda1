"""Batched EPnP + RANSAC tests."""
import numpy as np
import jax
import jax.numpy as jnp

from multiagent_orb_slam2_tpu.geometry import se3, epnp
from multiagent_orb_slam2_tpu.geometry.camera import Intrinsics

CAM = Intrinsics(fx=450.0, fy=450.0, cx=320.0, cy=240.0)


def make_pnp(n=100, noise=0.5, outlier_frac=0.0, seed=0):
    rng = np.random.default_rng(seed)
    pw = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                   rng.uniform(4, 15, n)], -1).astype(np.float32)
    q, t = se3.se3_exp(jnp.asarray(rng.normal(size=6) * 0.3))
    pc = np.asarray(se3.apply(q, t, jnp.asarray(pw)))
    # keep only points in front
    keep = pc[:, 2] > 0.5
    pw, pc = pw[keep], pc[keep]
    n = len(pw)
    uv = np.stack([CAM.fx * pc[:, 0] / pc[:, 2] + CAM.cx,
                   CAM.fy * pc[:, 1] / pc[:, 2] + CAM.cy], -1)
    uv += rng.normal(0, noise, uv.shape)
    n_out = int(n * outlier_frac)
    if n_out:
        uv[:n_out] = rng.uniform(0, [640, 480], (n_out, 2))
    return jnp.asarray(pw), jnp.asarray(uv, jnp.float32), (q, t), n_out


def pose_err(qe, te, q, t):
    dq, dt = se3.relative(qe, te, q, t)
    return float(jnp.linalg.norm(se3.se3_log(dq, dt)))


def test_epnp_clean():
    pw, uv, (q, t), _ = make_pnp(noise=0.0)
    qe, te = epnp.epnp_solve(pw, uv, CAM)
    assert pose_err(qe, te, q, t) < 1e-3


def test_epnp_batched():
    pw, uv, (q, t), _ = make_pnp(noise=0.0, seed=1)
    qe, te = epnp.epnp_solve(jnp.stack([pw, pw]), jnp.stack([uv, uv]), CAM)
    assert qe.shape == (2, 4)
    assert pose_err(qe[0], te[0], q, t) < 1e-3


def test_ransac_with_outliers():
    pw, uv, (q, t), n_out = make_pnp(n=150, noise=0.5, outlier_frac=0.3,
                                     seed=2)
    res = epnp.epnp_ransac(pw, uv, jnp.ones(len(pw)),
                           jnp.ones(len(pw), bool), CAM,
                           jax.random.PRNGKey(0), n_iters=300)
    assert bool(res.ok)
    assert pose_err(res.q, res.t, q, t) < 0.05
    inl = np.asarray(res.inliers)
    assert inl[:n_out].mean() < 0.2       # outliers rejected
    assert inl[n_out:].mean() > 0.7       # inliers kept
