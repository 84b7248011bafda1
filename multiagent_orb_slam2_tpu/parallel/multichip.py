"""Multi-chip scale-out steps: the per-frame front end (ORB extraction +
matching) and per-agent pose optimization data-parallel over the `agents`
mesh axis, plus distributed global BA with map points sharded over the
`points` axis.

This is the engine's scale-out unit of work, the analogue of one scheduler
tick of the reference's thread farm (SURVEY.md §2g): every agent extracts
and matches its frame and advances one pose optimization, then the shared
map runs one distributed BA round. Used by
__graft_entry__.dryrun_multichip to validate the sharding story end-to-end
on a virtual device mesh, and by the pod-scale driver. Host-driven phases
(keyframe pipeline, loop closing, fusion) stay single-controller programs
over the same sharded arrays.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import OptimizerConfig, OrbConfig
from ..geometry.camera import Intrinsics
from ..optim import ba as ba_mod
from ..optim import pose_opt
from . import dist_ba


def make_2d_mesh(n_devices: int, n_agents_axis: int = None) -> Mesh:
    """(agents, points) mesh over n_devices."""
    a = n_agents_axis or (2 if n_devices % 2 == 0 and n_devices >= 2 else 1)
    p = n_devices // a
    devs = np.array(jax.devices()[:a * p]).reshape(a, p)
    return Mesh(devs, ("agents", "points"))


@functools.partial(jax.jit, static_argnames=("ocfg", "mesh"))
def multichip_frontend(imgs, prev_desc, prev_valid, ocfg: OrbConfig,
                       mesh: Mesh):
    """Per-agent front end under the mesh: ORB extraction + frame-to-frame
    descriptor matching, data-parallel over the agents axis (the reference
    runs one ORBextractor + ORBmatcher per agent thread,
    src/Tracking.cc:210 + SURVEY.md §3.2).

    imgs: [A, H, W] float32; prev_desc/prev_valid: [A, N, 8] / [A, N].
    Returns (desc [A, N, 8], valid [A, N], n_matches [A])."""
    from ..ops import matchers, orb
    aspec = P("agents")

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(aspec, aspec, aspec),
                       out_specs=(aspec, aspec, aspec),
                       check_vma=False)
    def block(im, pd, pv):
        def one(im_i, pd_i, pv_i):
            kp = orb.extract(im_i, ocfg)
            res = matchers.match_brute(kp.desc, kp.valid, pd_i, pv_i,
                                       th=64, nn_ratio=0.9)
            return kp.desc, kp.valid, jnp.sum(res.ok.astype(jnp.int32))
        return jax.vmap(one)(im, pd, pv)

    return block(imgs, prev_desc, prev_valid)


@functools.partial(jax.jit, static_argnames=("cam", "mesh", "cfg", "ba_iters"))
def multichip_step(agent_q, agent_t, agent_obs: pose_opt.PoseObs,
                   ba_prob: ba_mod.BAProblem, cam: Intrinsics, mesh: Mesh,
                   cfg: OptimizerConfig = OptimizerConfig(),
                   ba_iters: int = 2):
    """One full step: per-agent pose optimization (dp) + one distributed BA
    (point-sharded). agent_* have a leading agents axis divisible by the
    mesh's agents dimension; ba_prob's point axis divides the points
    dimension."""
    aspec = P("agents")

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(aspec, aspec,
                  pose_opt.PoseObs(*([aspec] * len(pose_opt.PoseObs._fields)))),
        out_specs=(aspec, aspec, aspec),
        check_vma=False)
    def track_block(q0, t0, obs):
        def one(q0_i, t0_i, obs_i):
            q, t, inl, n = pose_opt.pose_optimize(q0_i, t0_i, obs_i, cam, cfg,
                                                  use_pallas=False)
            return q, t, n
        return jax.vmap(one)(q0, t0, obs)

    q_new, t_new, n_inl = track_block(agent_q, agent_t, agent_obs)

    qb, tb, pw = dist_ba.distributed_ba_solve(
        ba_prob, cam, mesh, n_iters=ba_iters, axis="points")
    return q_new, t_new, n_inl, qb, tb, pw
