"""Pose-only optimization: the hottest per-frame optimizer.

Replaces Optimizer::PoseOptimization (reference src/Optimizer.cc:241-453):
a single 6-DoF world-to-camera pose against fixed map points, 4 rounds of
10 LM iterations each, chi-square outlier relabeling between rounds
(5.991 mono / 7.815 stereo), Huber kernel dropped for the final round
(reference: `if(it==2) e->setRobustKernel(0)` after round 2's relabel).

TPU design: all observations live in fixed-capacity arrays with masks; one
round is a lax.fori_loop of dense 6x6 normal-equation solves — no graph
construction, no heap. The whole 4-round schedule jits into a single XLA
program; vmapping over a leading axis batches agents.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import OptimizerConfig
from ..geometry import se3
from ..geometry.camera import Intrinsics
from . import residuals as res


class PoseObs(NamedTuple):
    """Fixed-capacity observation set for one frame."""
    pw: jnp.ndarray         # [N, 3] world points (fixed)
    obs: jnp.ndarray        # [N, 3] (u, v, u_right); u_right ignored for mono
    inv_sigma2: jnp.ndarray  # [N] information scale 1/1.2^(2 level)
    is_stereo: jnp.ndarray  # [N] bool
    mask: jnp.ndarray       # [N] bool valid observation


def _chi2(r, inv_sigma2, is_stereo):
    """Per-observation chi2 with the reference's information convention
    (Omega = inv_sigma2 * I_2 or I_3)."""
    return jnp.sum(r * r, axis=-1) * inv_sigma2


def _solve_normal(H, b, lm_lambda):
    damped = H + lm_lambda * jnp.diag(jnp.diag(H))
    # 6x6 solve; add a floor on the diagonal for rank-deficient cases
    damped = damped + 1e-9 * jnp.eye(6, dtype=H.dtype)
    return jnp.linalg.solve(damped, b)


def _build_normal_eq(cam, q, t, o: PoseObs, active, delta2_m, delta2_s,
                     use_huber: bool):
    r, _ = res.project_residual(cam, q, t, o.pw, o.obs, o.is_stereo)
    Jp, _, pc = res.jacobians(cam, q, t, o.pw, o.is_stereo)
    chi2 = _chi2(r, o.inv_sigma2, o.is_stereo)
    delta2 = jnp.where(o.is_stereo, delta2_s, delta2_m)
    w_rob = res.huber_weight(chi2, delta2) if use_huber else jnp.ones_like(chi2)
    w = o.inv_sigma2 * w_rob * active
    # behind-camera points contribute nothing
    w = w * (pc[..., 2] > 0.01)
    H = jnp.einsum("nij,nik,n->jk", Jp, Jp, w)
    b = -jnp.einsum("nij,ni,n->j", Jp, r, w)
    if use_huber:
        # true Huber cost (monotone, unbounded) so LM accept/reject tracks
        # real descent even far from the optimum
        delta = jnp.sqrt(delta2)
        rho = jnp.where(chi2 <= delta2, chi2,
                        2.0 * delta * jnp.sqrt(jnp.maximum(chi2, 1e-12)) - delta2)
    else:
        rho = chi2
    cost = jnp.sum(rho * active)
    return H, b, cost, chi2


def pose_optimize(q0, t0, obs: PoseObs, cam: Intrinsics,
                  cfg: OptimizerConfig = OptimizerConfig(),
                  use_pallas=None):
    """Optimize a single Tcw against fixed points.

    Returns (q, t, inlier_mask, n_inliers). Matches the reference schedule:
    pose_opt_rounds rounds x pose_opt_iters LM iterations, relabeling
    observations by chi2 between rounds; final round runs without the Huber
    kernel on inliers only.

    On TPU the whole schedule runs as one fused Pallas kernel
    (pose_opt_pallas) — the XLA formulation's ~2800 small op executions
    cost ~50 ms/call at F=2048 in pure dispatch overhead. Pass
    use_pallas=False for vmapped callers (parallel.multichip) and CPU.
    """
    if use_pallas is None:
        import os
        use_pallas = jax.default_backend() != "cpu" \
            and os.environ.get("MAOS_NO_PALLAS") != "1"
    if use_pallas:
        from .pose_opt_pallas import pose_optimize_pallas
        return pose_optimize_pallas(q0, t0, obs, cam, cfg)
    return _pose_optimize_xla(q0, t0, obs, cam, cfg)


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def _pose_optimize_xla(q0, t0, obs: PoseObs, cam: Intrinsics,
                       cfg: OptimizerConfig = OptimizerConfig()):
    delta2_m = cfg.chi2_mono
    delta2_s = cfg.chi2_stereo
    chi2_th = jnp.where(obs.is_stereo, cfg.chi2_stereo, cfg.chi2_mono)

    inlier = obs.mask

    def lm_round(q, t, inlier, use_huber):
        def body(_, carry):
            q, t, lam = carry
            H, b, cost0, _ = _build_normal_eq(
                cam, q, t, obs, inlier.astype(q.dtype), delta2_m, delta2_s,
                use_huber)
            dx = _solve_normal(H, b, lam)
            dq, dt = se3.se3_exp(dx)
            q_new, t_new = se3.compose(dq, dt, q, t)
            # renormalize every accepted step: compose drifts the norm, and
            # an unnormalized pose fed back through the constant-velocity
            # prediction COMPOUNDS multiplicatively across frames until
            # projection collapses (|q| reached 2.57 in 6 frames on the
            # lifecycle test; the Pallas kernel normalizes in-register,
            # pose_opt_pallas.py:110, which is why only the XLA path broke)
            q_new = se3.quat_normalize(q_new)
            _, _, cost1, _ = _build_normal_eq(
                cam, q_new, t_new, obs, inlier.astype(q.dtype), delta2_m,
                delta2_s, use_huber)
            accept = cost1 < cost0
            q = jnp.where(accept, q_new, q)
            t = jnp.where(accept, t_new, t)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            lam = jnp.clip(lam, 1e-8, 1e6)
            return q, t, lam

        q, t, _ = jax.lax.fori_loop(0, cfg.pose_opt_iters, body,
                                    (q, t, jnp.asarray(1e-3, q.dtype)))
        return q, t

    q, t = q0, t0
    for rnd in range(cfg.pose_opt_rounds):
        use_huber = rnd < cfg.pose_opt_rounds - 1
        q, t = lm_round(q, t, inlier, use_huber)
        # relabel by chi2 at the current pose (reference re-admits improved obs)
        r, pc = res.project_residual(cam, q, t, obs.pw, obs.obs, obs.is_stereo)
        chi2 = _chi2(r, obs.inv_sigma2, obs.is_stereo)
        inlier = obs.mask & (chi2 <= chi2_th) & (pc[..., 2] > 0.01)

    return q, t, inlier, jnp.sum(inlier.astype(jnp.int32))
