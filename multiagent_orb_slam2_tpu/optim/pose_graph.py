"""Sim3 pose-graph optimization (the essential graph).

Replaces Optimizer::OptimizeEssentialGraph (reference src/Optimizer.cc:
786-1049): all keyframes as Sim3 vertices (scale fixed to 1 for
stereo/RGB-D), edges from loop closures, the spanning tree, previous loop
edges, and strong covisibility pairs (>=100 shared points); the loop
keyframe is fixed; 20 LM iterations; then SE3 recovery by dividing
translation by scale and map-point correction via each point's reference
keyframe.

TPU formulation: edges are capacity-padded arrays; per-edge 7-vector
residuals r_e = log(S_meas_e * S_i * S_j^-1) and their Jacobians w.r.t. both
endpoint updates come from vmapped forward-mode autodiff; the [7K, 7K]
normal matrix is assembled by segment_sum scatter of 7x7 blocks and solved
dense (K <= 1024 keyframes -> at most 7168^2, well inside one chip's HBM;
the sharded variant lives in parallel/).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3, sim3


class PoseGraphEdges(NamedTuple):
    """Capacity-padded edge list."""
    i: jnp.ndarray        # [E] int32 source keyframe
    j: jnp.ndarray        # [E] int32 target keyframe
    s: jnp.ndarray        # [E] measured S_ji scale
    q: jnp.ndarray        # [E, 4] measured S_ji rotation
    t: jnp.ndarray        # [E, 3] measured S_ji translation
    valid: jnp.ndarray    # [E] bool


def make_edge_measurements(s_i, q_i, t_i, s_j, q_j, t_j):
    """Measured relative transform S_ji = S_j * S_i^-1 from current vertex
    estimates (how the reference builds spanning-tree/covis edge
    measurements, src/Optimizer.cc:880-920)."""
    si_inv, qi_inv, ti_inv = sim3.inverse(s_i, q_i, t_i)
    return sim3.compose(s_j, q_j, t_j, si_inv, qi_inv, ti_inv)


def _edge_residual(xi_i, xi_j, s_i, q_i, t_i, s_j, q_j, t_j,
                   s_m, q_m, t_m, fix_scale: bool):
    """r = log(S_m * (exp(xi_i) S_i) * (exp(xi_j) S_j)^-1), 7-vector."""
    if fix_scale:
        xi_i = xi_i.at[6].set(0.0)
        xi_j = xi_j.at[6].set(0.0)
    dsi, dqi, dti = sim3.exp(xi_i)
    si, qi, ti = sim3.compose(dsi, dqi, dti, s_i, q_i, t_i)
    dsj, dqj, dtj = sim3.exp(xi_j)
    sj, qj, tj = sim3.compose(dsj, dqj, dtj, s_j, q_j, t_j)
    sji, qji, tji = sim3.inverse(sj, qj, tj)
    s1, q1, t1 = sim3.compose(si, qi, ti, sji, qji, tji)
    s2, q2, t2 = sim3.compose(s_m, q_m, t_m, s1, q1, t1)
    return sim3.log(s2, q2, t2)


class PoseGraphResult(NamedTuple):
    s: jnp.ndarray
    q: jnp.ndarray
    t: jnp.ndarray
    final_chi2: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("fix_scale", "n_iters"))
def optimize_pose_graph(s0, q0, t0, vertex_valid, vertex_fixed,
                        edges: PoseGraphEdges, fix_scale: bool = True,
                        n_iters: int = 20) -> PoseGraphResult:
    """LM over all Sim3 vertices. s0 [K], q0 [K,4], t0 [K,3]."""
    K = s0.shape[0]
    D = 7
    free = vertex_valid & ~vertex_fixed

    res_fn = jax.vmap(_edge_residual,
                      in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, None))
    jac_fn = jax.vmap(jax.jacfwd(_edge_residual, argnums=(0, 1)),
                      in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, None))

    ii = jnp.clip(edges.i, 0, K - 1)
    jj = jnp.clip(edges.j, 0, K - 1)
    E = ii.shape[0]
    zeros = jnp.zeros((E, D))

    def build(s, q, t):
        args = (zeros, zeros, s[ii], q[ii], t[ii], s[jj], q[jj], t[jj],
                edges.s, edges.q, edges.t)
        r = res_fn(*args, fix_scale)                    # [E, 7]
        Ji, Jj = jac_fn(*args, fix_scale)               # [E, 7, 7] each
        w = edges.valid.astype(s.dtype)
        chi2 = jnp.sum(r * r, -1) * w
        return r, Ji, Jj, w, jnp.sum(chi2)

    def assemble_solve(r, Ji, Jj, w, lam):
        # block H assembly into [K+1, K+1, 7, 7] via segment_sum
        KK = K + 1
        idx_ii = ii * KK + ii
        idx_jj = jj * KK + jj
        idx_ij = ii * KK + jj
        idx_ji = jj * KK + ii
        pad = KK * KK
        wv = w[:, None, None]
        blocks = jnp.concatenate([
            jnp.einsum("eki,ekj->eij", Ji, Ji) * wv,
            jnp.einsum("eki,ekj->eij", Jj, Jj) * wv,
            jnp.einsum("eki,ekj->eij", Ji, Jj) * wv,
            jnp.einsum("eki,ekj->eij", Jj, Ji) * wv,
        ])
        idx = jnp.concatenate([
            jnp.where(edges.valid, idx_ii, pad),
            jnp.where(edges.valid, idx_jj, pad),
            jnp.where(edges.valid, idx_ij, pad),
            jnp.where(edges.valid, idx_ji, pad)])
        H = jax.ops.segment_sum(blocks, idx, num_segments=pad + 1)[:pad]
        H = H.reshape(KK, KK, D, D)[:K, :K]
        bvec = jnp.concatenate([
            -jnp.einsum("eki,ek->ei", Ji, r) * w[:, None],
            -jnp.einsum("eki,ek->ei", Jj, r) * w[:, None]])
        bidx = jnp.concatenate([jnp.where(edges.valid, ii, K),
                                jnp.where(edges.valid, jj, K)])
        b = jax.ops.segment_sum(bvec, bidx, num_segments=K + 1)[:K]

        # damping + gauge fixing
        hd = H[jnp.arange(K), jnp.arange(K)]
        dd = jnp.diagonal(hd, axis1=-2, axis2=-1)
        H = H.at[jnp.arange(K)[:, None], jnp.arange(K)[:, None],
                 jnp.arange(D)[None, :], jnp.arange(D)[None, :]].add(
                     lam * dd + 1e-6)
        H = jnp.where(free[:, None, None, None] & free[None, :, None, None],
                      H, 0.0)
        H = H.at[jnp.arange(K), jnp.arange(K)].add(
            jnp.where(free, 0.0, 1.0)[:, None, None] * jnp.eye(D))
        b = jnp.where(free[:, None], b, 0.0)
        Hd = H.transpose(0, 2, 1, 3).reshape(K * D, K * D)
        dx = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(Hd + 1e-8 * jnp.eye(K * D)),
            b.reshape(-1)).reshape(K, D)
        return jnp.where(free[:, None], dx, 0.0)

    def body(_, carry):
        s, q, t, lam = carry
        r, Ji, Jj, w, cost0 = build(s, q, t)
        dx = assemble_solve(r, Ji, Jj, w, lam)
        if fix_scale:
            dx = dx.at[:, 6].set(0.0)
        ds, dq, dt = sim3.exp(dx)
        s2, q2, t2 = sim3.compose(ds, dq, dt, s, q, t)
        q2 = se3.quat_normalize(q2)
        _, _, _, _, cost1 = build(s2, q2, t2)
        accept = cost1 < cost0
        s = jnp.where(accept, s2, s)
        q = jnp.where(accept, q2, q)
        t = jnp.where(accept, t2, t)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 5.0), 1e-10, 1e5)
        return s, q, t, lam

    s, q, t, _ = jax.lax.fori_loop(0, n_iters, body,
                                   (s0, q0, t0, jnp.asarray(1e-6)))
    _, _, _, _, chi2 = build(s, q, t)
    return PoseGraphResult(s=s, q=q, t=t, final_chi2=chi2)
