"""Distributed bundle adjustment: points sharded over the mesh, pose system
psum-reduced.

The Schur trick makes BA embarrassingly shardable along the point axis
(SURVEY.md §5 'distributed LM for global BA'): every observation couples one
pose and one point, so with points (and their observation rows) sharded,

  - point blocks, back-substitution, residual/Jacobian work: fully local
    (the E-major fast kernels of optim.ba_kernels run unchanged per shard);
  - pose-block Hessian, Schur cross products and the robust cost: local
    partial sums + one psum over the point axis per LM iteration;
  - the reduced camera solve (block-Jacobi PCG): replicated on every device
    (K <= ~1k poses — cheaper than distributing a small solve).

Collectives ride ICI inside a slice; the same code runs on a virtual CPU
mesh in CI (conftest) and on a pod slice in production.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..geometry import se3
from ..geometry.camera import Intrinsics
from ..optim import ba as ba_mod
from ..optim import ba_kernels as bk


def make_mesh(n_devices: int = None, axis: str = "points") -> Mesh:
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    import numpy as np
    return Mesh(np.array(devs), (axis,))


@functools.partial(jax.jit,
                   static_argnames=("cam", "mesh", "n_iters", "use_huber",
                                    "axis", "chunk", "pcg_iters", "band",
                                    "cross_bf16"))
def distributed_ba_solve(prob: ba_mod.BAProblem, cam: Intrinsics, mesh: Mesh,
                         n_iters: int = 10, use_huber: bool = True,
                         chi2_mono: float = 5.991, chi2_stereo: float = 7.815,
                         axis: str = None, chunk: int = 2048,
                         pcg_iters: int = 48, band="auto", cross_bf16=None):
    """ba_solve_fast with the point axis sharded over `axis` of `mesh`.

    The leading dim of prob.pw / point_valid / obs_* must divide the mesh
    size along `axis` (default: the mesh's last axis). Pose tables are
    replicated. Returns (q, t, pw) with pw sharded like the input.

    band / cross_bf16: the single-chip banded-assembly fast path
    (optim.ba._classify_band) runs per shard — classification, point sort
    and the exact overflow pass are all shard-local (each device sorts its
    own point shard), so the banded win carries over unchanged; only the
    psum of the reduced system sees the (identical-shape) results.
    """
    axis = axis or mesh.axis_names[-1]
    pspec = P(axis)
    rspec = P()
    if cross_bf16 is None:
        cross_bf16 = False
    n_shards = int(mesh.shape[axis])
    P_local = prob.pw.shape[0] // n_shards
    K = prob.q.shape[0]
    if band == "auto":
        band = (128, max(256, P_local // 16), 64) \
            if (K >= 192 and P_local >= 8192) else None
    elif isinstance(band, int):
        band = (band, max(256, P_local // 16), 1)

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
        local_chunk = max(min(chunk, prob_l.pw.shape[0] // 4), 1)
        perm = None
        band_data = None
        band2 = None
        if band is not None:
            R, OC, snap = band
            perm, base_c, inb, ov_idx, _ = ba_mod._classify_band(
                prob_l, local_chunk, R, OC, snap)
            prob_l = prob_l._replace(
                pw=prob_l.pw[perm], point_valid=prob_l.point_valid[perm],
                obs_kf=prob_l.obs_kf[perm], obs_uvr=prob_l.obs_uvr[perm],
                obs_inv_sigma2=prob_l.obs_inv_sigma2[perm],
                obs_stereo=prob_l.obs_stereo[perm],
                obs_mask=prob_l.obs_mask[perm])
            band_data = (base_c, inb, ov_idx,
                         ba_mod._band_onehot(prob_l, base_c, inb, R))
            band2 = (R, OC, snap)
        pre = ba_mod._prepare_e(prob_l)
        kf_e, active, obs_uvr_t, inv_sigma2_e, stereo_e = pre

        def body(_, carry):
            q, t, pw, qb, tb, pwb, cost_prev, lam = carry
            dc, dp, cost_here = ba_mod._build_and_solve_fast(
                prob_l, pre, q, t, pw, cam, lam, chi2_mono, chi2_stereo,
                use_huber, local_chunk, pcg_iters, psum_axis=axis,
                band=band2, band_data=band_data, cross_bf16=cross_bf16)
            improved = cost_here <= cost_prev
            lam = jnp.clip(jnp.where(improved, lam * 0.5, lam * 5.0),
                           1e-8, 1e4)
            dq, dt = se3.se3_exp(dc)
            q_step, t_step = se3.compose(dq, dt, q, t)
            q_step = se3.quat_normalize(q_step)
            pw_step = pw + dp
            q_next = jnp.where(improved, q_step, qb)
            t_next = jnp.where(improved, t_step, tb)
            pw_next = jnp.where(improved, pw_step, pwb)
            qb = jnp.where(improved, q, qb)
            tb = jnp.where(improved, t, tb)
            pwb = jnp.where(improved, pw, pwb)
            cost_prev = jnp.minimum(cost_here, cost_prev)
            return q_next, t_next, pw_next, qb, tb, pwb, cost_prev, lam

        init = (prob_l.q, prob_l.t, prob_l.pw, prob_l.q, prob_l.t,
                prob_l.pw, jnp.asarray(jnp.inf), jnp.asarray(1e-4))
        q, t, pw, qb, tb, pwb, cost_prev, _ = jax.lax.fori_loop(
            0, n_iters, body, init)
        cost_final, _ = bk.cost_e(kf_e, obs_uvr_t, inv_sigma2_e, stereo_e,
                                  active, q, t, pw, cam, chi2_mono,
                                  chi2_stereo, use_huber)
        cost_final = jax.lax.psum(cost_final, axis)
        take = cost_final <= cost_prev
        q = jnp.where(take, q, qb)
        t = jnp.where(take, t, tb)
        pw = jnp.where(take, pw, pwb)
        if perm is not None:
            pw = pw[jnp.argsort(perm)]
        return q, t, pw

    return run(prob)
