"""Worker process for tests/test_multihost.py (2-process jax.distributed).

Each process initializes jax.distributed against a local coordinator, forms
the global mesh over BOTH processes' CPU devices, runs the point-sharded
distributed BA on a deterministic problem, and process 0 checks the result
against the single-process solver.
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    coord = sys.argv[1]
    pid = int(sys.argv[2])
    nproc = int(sys.argv[3])
    out_path = sys.argv[4]

    from multiagent_orb_slam2_tpu.parallel import multihost
    multihost.init_distributed(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc * 2, len(jax.devices())

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from multiagent_orb_slam2_tpu.parallel import dist_ba
    from multiagent_orb_slam2_tpu.optim import ba as ba_mod
    sys.path.insert(0, os.path.dirname(__file__))
    from test_ba import make_ba_problem, CAM

    prob, _ = make_ba_problem(K=8, P=256, M=6, seed=5)
    mesh = multihost.global_mesh(axis_names=("points",), agents_dim=1)
    assert mesh.devices.size == nproc * 2

    # globalize: point-axis leaves sharded over the mesh, pose leaves
    # replicated (every process holds the full host array)
    pspec = NamedSharding(mesh, P("points"))
    rspec = NamedSharding(mesh, P())

    def put(x, spec):
        return jax.make_array_from_process_local_data(spec, np.asarray(x))

    gprob = ba_mod.BAProblem(
        q=put(prob.q, rspec), t=put(prob.t, rspec),
        pose_valid=put(prob.pose_valid, rspec),
        pose_fixed=put(prob.pose_fixed, rspec),
        pw=put(prob.pw, pspec), point_valid=put(prob.point_valid, pspec),
        obs_kf=put(prob.obs_kf, pspec), obs_uvr=put(prob.obs_uvr, pspec),
        obs_inv_sigma2=put(prob.obs_inv_sigma2, pspec),
        obs_stereo=put(prob.obs_stereo, pspec),
        obs_mask=put(prob.obs_mask, pspec))

    q, t, pw = dist_ba.distributed_ba_solve(gprob, CAM, mesh, n_iters=6,
                                            axis="points", chunk=64,
                                            pcg_iters=48)
    # pose outputs are replicated: any addressable shard holds the result
    q_l = np.asarray(q.addressable_data(0))
    t_l = np.asarray(t.addressable_data(0))

    # reference: single-process fast solver on the same problem
    ref = ba_mod.ba_solve_fast(prob, CAM, n_iters=6, chunk=64, pcg_iters=48,
                               band=None, use_pallas=False)
    dq = np.abs(q_l - np.asarray(ref.q)).max()
    dt = np.abs(t_l - np.asarray(ref.t)).max()
    if pid == 0:
        with open(out_path, "w") as f:
            f.write(f"{dq:.6e} {dt:.6e}\n")
    print(f"proc {pid}: dq={dq:.2e} dt={dt:.2e}", flush=True)
    assert dq < 5e-3, dq
    assert dt < 5e-3, dt


if __name__ == "__main__":
    main()
