"""Sim3 refinement between two keyframes (OptimizeSim3).

Replaces Optimizer::OptimizeSim3 (reference src/Optimizer.cc:1051-1246):
a single Sim3 vertex S12 (frame-2 camera coords -> frame-1 camera coords)
against fixed matched point pairs, with bidirectional projection edges
(EdgeSim3ProjectXYZ / EdgeInverseSim3ProjectXYZ), Huber sqrt(10), inlier
re-gating after the first rounds, LM throughout.

Jacobians come from forward-mode autodiff of the residual stack w.r.t. the
7-vector left-update — at <=1024 point pairs this is 7 JVPs of a tiny
function, cheaper than hand-deriving the Sim3 chain rule and trivially
correct.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3, sim3
from ..geometry.camera import Intrinsics


class Sim3OptResult(NamedTuple):
    s: jnp.ndarray
    q: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def _residuals(xi, s0, q0, t0, x1, x2, uv1, uv2, cam: Intrinsics,
               fix_scale: bool):
    """Bidirectional reprojection residuals for update exp(xi) ∘ S12."""
    if fix_scale:
        xi = xi.at[6].set(0.0)
    ds, dq, dt = sim3.exp(xi)
    s, q, t = sim3.compose(ds, dq, dt, s0, q0, t0)
    si, qi, ti = sim3.inverse(s, q, t)

    def project(p):
        z = jnp.maximum(p[..., 2], 1e-6)
        return jnp.stack([cam.fx * p[..., 0] / z + cam.cx,
                          cam.fy * p[..., 1] / z + cam.cy], -1)

    p2_in1 = s * se3.quat_rotate(q, x2) + t
    p1_in2 = si * se3.quat_rotate(qi, x1) + ti
    r1 = uv1 - project(p2_in1)        # [N, 2] error in image 1
    r2 = uv2 - project(p1_in2)        # [N, 2] error in image 2
    return r1, r2


@functools.partial(jax.jit, static_argnames=("cam", "fix_scale", "n_iters"))
def optimize_sim3(s0, q0, t0, x1, x2, uv1, uv2, inv_sigma2_1, inv_sigma2_2,
                  mask, cam: Intrinsics, fix_scale: bool = False,
                  n_iters: int = 10, chi2_th: float = 10.0) -> Sim3OptResult:
    """LM on S12 with Huber(sqrt(10)) and a mid-way outlier erasure, as the
    reference does (first 5 iterations, drop chi2>10 edges, 10 more)."""

    def chi2_fn(s, q, t, huber: bool):
        r1, r2 = _residuals(jnp.zeros(7), s, q, t, x1, x2, uv1, uv2, cam,
                            fix_scale)
        c1 = jnp.sum(r1 * r1, -1) * inv_sigma2_1
        c2 = jnp.sum(r2 * r2, -1) * inv_sigma2_2
        return c1, c2

    def robust_cost(s, q, t, active):
        r1, r2 = _residuals(jnp.zeros(7), s, q, t, x1, x2, uv1, uv2, cam,
                            fix_scale)
        c1 = jnp.sum(r1 * r1, -1) * inv_sigma2_1
        c2 = jnp.sum(r2 * r2, -1) * inv_sigma2_2
        return jnp.sum((_robust(c1, chi2_th) + _robust(c2, chi2_th)) * active)

    def lm_iters(s, q, t, active, n):
        def body(_, carry):
            s, q, t, lam = carry

            def res_flat(xi):
                r1, r2 = _residuals(xi, s, q, t, x1, x2, uv1, uv2, cam,
                                    fix_scale)
                w1 = jnp.sqrt(inv_sigma2_1 * active)
                w2 = jnp.sqrt(inv_sigma2_2 * active)
                return jnp.concatenate([(r1 * w1[:, None]).reshape(-1),
                                        (r2 * w2[:, None]).reshape(-1)])

            J = jax.jacfwd(res_flat)(jnp.zeros(7))       # [2N*2, 7]
            r = res_flat(jnp.zeros(7))
            # Huber IRLS on per-observation 2-vector blocks
            rb = r.reshape(-1, 2)
            c = jnp.sum(rb * rb, -1)
            w_rob = jnp.minimum(1.0, jnp.sqrt(chi2_th / jnp.maximum(c, 1e-12)))
            w = jnp.repeat(w_rob, 2)
            H = J.T @ (J * w[:, None])
            b = -J.T @ (r * w)
            H = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-6))
            dx = jnp.linalg.solve(H + 1e-9 * jnp.eye(7), b)
            ds, dq, dt = sim3.exp(dx if not fix_scale else dx.at[6].set(0.0))
            s2, q2, t2 = sim3.compose(ds, dq, dt, s, q, t)
            cost0 = robust_cost(s, q, t, active)
            cost1 = robust_cost(s2, q2, t2, active)
            accept = cost1 < cost0
            s = jnp.where(accept, s2, s)
            q = jnp.where(accept, q2, q)
            t = jnp.where(accept, t2, t)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 5.0), 1e-8, 1e5)
            return s, q, t, lam

        s, q, t, _ = jax.lax.fori_loop(0, n, body, (s, q, t, jnp.asarray(1e-4)))
        return s, q, t

    active = mask.astype(jnp.float32)
    s, q, t = lm_iters(s0, q0, t0, active, n_iters)
    c1, c2 = chi2_fn(s, q, t, True)
    inl = mask & (c1 <= chi2_th) & (c2 <= chi2_th)
    s, q, t = lm_iters(s, q, t, inl.astype(jnp.float32), n_iters)
    c1, c2 = chi2_fn(s, q, t, False)
    inl = mask & (c1 <= chi2_th) & (c2 <= chi2_th)
    return Sim3OptResult(s=s, q=q, t=t, inliers=inl,
                         n_inliers=jnp.sum(inl.astype(jnp.int32)))


def _robust(chi2, delta2):
    delta = jnp.sqrt(delta2)
    return jnp.where(chi2 <= delta2, chi2,
                     2.0 * delta * jnp.sqrt(jnp.maximum(chi2, 1e-12)) - delta2)
