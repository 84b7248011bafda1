"""Distributed bundle adjustment: points sharded over the mesh, pose system
psum-reduced.

The Schur trick makes BA embarrassingly shardable along the point axis
(SURVEY.md §5 'distributed LM for global BA'): every observation couples one
pose and one point, so with points (and their observation rows) sharded,

  - point blocks Hpp^-1, point back-substitution: fully local;
  - pose-block Hessian Hcc and the Schur cross products W Hpp^-1 W^T:
    local partial sums + one psum over the point axis;
  - the reduced [6K, 6K] camera solve: replicated on every device
    (K <= ~1k poses; the dense solve is microseconds-to-ms on the MXU and
    cheaper than distributing a small Cholesky).

Collectives ride ICI inside a slice; nothing here assumes a particular mesh
shape, so the same code runs on a virtual CPU mesh in CI (conftest) and on a
pod slice in production.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry import se3
from ..geometry.camera import Intrinsics
from ..optim import ba as ba_mod


def make_mesh(n_devices: int = None, axis: str = "points") -> Mesh:
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    import numpy as np
    return Mesh(np.array(devs), (axis,))


def _local_terms(prob: ba_mod.BAProblem, q, t, pw_local, cam, lam,
                 delta2_m, delta2_s, use_huber):
    """Per-shard normal-equation pieces. prob carries the LOCAL point shard
    (pw, point_valid, obs_*) but the FULL pose table (replicated)."""
    K = q.shape[0]
    r, Jc, Jp, w, chi2, cost = ba_mod._obs_terms(
        prob._replace(pw=pw_local), q, t, pw_local, cam, delta2_m, delta2_s,
        use_huber)
    Hpp = jnp.einsum("pmij,pmik,pm->pjk", Jp, Jp, w)
    bp = -jnp.einsum("pmij,pmi,pm->pj", Jp, r, w)
    diag = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
    Hpp_d = Hpp.at[..., jnp.arange(3), jnp.arange(3)].add(lam * diag + 1e-8)
    Hpp_inv = jnp.linalg.inv(Hpp_d)

    kf_flat = jnp.where(prob.obs_kf >= 0, prob.obs_kf, K).reshape(-1)
    Hcc = jax.ops.segment_sum(
        jnp.einsum("pmij,pmik,pm->pmjk", Jc, Jc, w).reshape(-1, 6, 6),
        kf_flat, num_segments=K + 1)[:K]
    bc = jax.ops.segment_sum(
        -jnp.einsum("pmij,pmi,pm->pmj", Jc, r, w).reshape(-1, 6),
        kf_flat, num_segments=K + 1)[:K]

    Wb = jnp.einsum("pmij,pmik,pm->pmjk", Jc, Jp, w)
    Y = jnp.einsum("pmjk,pkl->pmjl", Wb, Hpp_inv)
    M = prob.obs_kf.shape[1]
    kf_i = jnp.where(prob.obs_kf >= 0, prob.obs_kf, K)
    invalid = (kf_i[:, :, None] >= K) | (kf_i[:, None, :] >= K)
    idx = jnp.where(invalid, (K + 1) * (K + 1),
                    kf_i[:, :, None] * (K + 1) + kf_i[:, None, :])
    contrib = jnp.einsum("pajk,pblk->pabjl", Y, Wb)
    S_cross = jax.ops.segment_sum(
        contrib.reshape(-1, 6, 6), idx.reshape(-1),
        num_segments=(K + 1) * (K + 1) + 1)[:(K + 1) * (K + 1)]
    rhs_p = jax.ops.segment_sum(
        jnp.einsum("pajk,pk->paj", Y, bp).reshape(-1, 6),
        kf_i.reshape(-1), num_segments=K + 1)
    return Hcc, bc, S_cross, rhs_p, Hpp_inv, bp, Wb, cost


@functools.partial(jax.jit,
                   static_argnames=("cam", "mesh", "n_iters", "use_huber",
                                    "axis"))
def distributed_ba_solve(prob: ba_mod.BAProblem, cam: Intrinsics, mesh: Mesh,
                         n_iters: int = 10, use_huber: bool = True,
                         chi2_mono: float = 5.991, chi2_stereo: float = 7.815,
                         axis: str = None):
    """Drop-in ba_solve with the point axis sharded over `mesh`.

    The leading dim of prob.pw / point_valid / obs_* must divide by the mesh
    size along `axis` (default: the mesh's last axis — on a 2D
    (agents, points) mesh the point shard rides the inner axis). Poses are
    replicated; each LM iteration does local Schur work plus one psum of
    ([K+1,K+1,6,6] cross blocks + [K,6,6] diag + rhs) and a replicated dense
    solve.
    """
    axis = axis or mesh.axis_names[-1]
    K = prob.q.shape[0]
    free = prob.pose_valid & ~prob.pose_fixed

    pspec = P(axis)
    rspec = P()

    point_leaves = dict(pw=pspec, point_valid=pspec, obs_kf=pspec,
                        obs_uvr=pspec, obs_inv_sigma2=pspec, obs_stereo=pspec,
                        obs_mask=pspec)
    in_spec = ba_mod.BAProblem(
        q=rspec, t=rspec, pose_valid=rspec, pose_fixed=rspec, **point_leaves)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(in_spec,),
        out_specs=(rspec, rspec, pspec),
        check_vma=False)
    def run(prob_l: ba_mod.BAProblem):
        def body(_, carry):
            q, t, pw, lam = carry
            p_l = prob_l._replace(pw=pw)
            Hcc, bc, S_cross, rhs_p, Hpp_inv, bp, Wb, cost0 = _local_terms(
                p_l, q, t, pw, cam, lam, chi2_mono, chi2_stereo, use_huber)
            # global reduction over the point axis
            Hcc = jax.lax.psum(Hcc, axis)
            bc = jax.lax.psum(bc, axis)
            S_cross = jax.lax.psum(S_cross, axis)
            rhs_p = jax.lax.psum(rhs_p, axis)
            cost0 = jax.lax.psum(cost0, axis)

            S = -S_cross.reshape(K + 1, K + 1, 6, 6)[:K, :K]
            S = S.at[jnp.arange(K), jnp.arange(K)].add(Hcc)
            dd = jnp.diagonal(Hcc, axis1=-2, axis2=-1)
            S = S.at[jnp.arange(K)[:, None], jnp.arange(K)[:, None],
                     jnp.arange(6)[None, :], jnp.arange(6)[None, :]].add(
                         lam * dd + 1e-8)
            S = jnp.where(free[:, None, None, None]
                          & free[None, :, None, None], S, 0.0)
            S = S.at[jnp.arange(K), jnp.arange(K)].add(
                jnp.where(free, 0.0, 1.0)[:, None, None] * jnp.eye(6))
            rhs = jnp.where(free[:, None], bc - rhs_p[:K], 0.0)
            Sd = S.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
            dc = jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(Sd + 1e-8 * jnp.eye(6 * K)),
                rhs.reshape(-1)).reshape(K, 6)
            dc = jnp.where(free[:, None], dc, 0.0)

            # local back-substitution
            kf_safe = jnp.clip(prob_l.obs_kf, 0, K - 1)
            corr = jnp.einsum("pmjk,pmj->pk", Wb, dc[kf_safe])
            dp = jnp.einsum("pkl,pl->pk", Hpp_inv, bp - corr)
            has_obs = jnp.any(prob_l.obs_mask & (prob_l.obs_kf >= 0), -1)
            dp = jnp.where((prob_l.point_valid & has_obs)[:, None], dp, 0.0)

            dq, dt = se3.se3_exp(dc)
            q_new, t_new = se3.compose(dq, dt, q, t)
            q_new = se3.quat_normalize(q_new)
            pw_new = pw + dp
            cost1 = jax.lax.psum(
                ba_mod._cost_only(prob_l._replace(pw=pw_new), q_new, t_new,
                                  pw_new, cam, chi2_mono, chi2_stereo,
                                  use_huber), axis)
            accept = cost1 < cost0
            q = jnp.where(accept, q_new, q)
            t = jnp.where(accept, t_new, t)
            pw = jnp.where(accept, pw_new, pw)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 5.0), 1e-8, 1e4)
            return q, t, pw, lam

        q, t, pw, _ = jax.lax.fori_loop(
            0, n_iters, body,
            (prob_l.q, prob_l.t, prob_l.pw, jnp.asarray(1e-4)))
        return q, t, pw

    return run(prob)
