"""Headline benchmark: global bundle adjustment at KITTI-00-split scale.

The reference's post-fusion global BA on KITTI 00 (two-agent split) takes
1426.5 ms on CPU at ~250 keyframes (BASELINE.md, Analysis/kitti/
stats_times_split_seq.txt); the BASELINE.json north star is >10x faster
distributed BA. This bench builds a synthetic BA problem of that scale
(256 keyframes, 64k points, ~500k observations — matching ~2000 features/KF
tracked across ~8 views) and times the 10-iteration LM global BA
(optim.ba.ba_solve) on the attached accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np

REF_GBA_MS = 1426.5  # reference g2o CPU GBA, KITTI 00 split (BASELINE.md)


def build_problem(K=256, P=65536, M=8, seed=0):
    import jax.numpy as jnp
    from multiagent_orb_slam2_tpu.geometry import se3
    from multiagent_orb_slam2_tpu.geometry.camera import Intrinsics
    from multiagent_orb_slam2_tpu.optim.ba import BAProblem

    cam = Intrinsics(fx=718.9, fy=718.9, cx=607.2, cy=185.2, bf=386.1,
                     width=1241, height=376)
    rng = np.random.default_rng(seed)

    # camera trajectory: forward motion with gentle yaw (KITTI-like)
    t_wc = np.cumsum(np.tile([0.0, 0.0, 1.0], (K, 1))
                     + rng.normal(0, 0.05, (K, 3)), axis=0).astype(np.float32)
    yaw = np.cumsum(rng.normal(0, 0.01, K)).astype(np.float32)
    q_wc = np.stack([np.cos(yaw / 2), np.zeros(K), np.sin(yaw / 2),
                     np.zeros(K)], -1).astype(np.float32)
    q_cw, t_cw = se3.inverse(jnp.asarray(q_wc), jnp.asarray(t_wc))
    q_cw, t_cw = np.asarray(q_cw), np.asarray(t_cw)

    # points near the trajectory
    anchor = rng.integers(0, K, P)
    pw = (t_wc[anchor] + np.stack([rng.uniform(-15, 15, P),
                                   rng.uniform(-3, 3, P),
                                   rng.uniform(5, 40, P)], -1)).astype(np.float32)

    # observations: M keyframes around each point's anchor
    offs = rng.integers(-6, 7, size=(P, M))
    obs_kf = np.clip(anchor[:, None] + offs, 0, K - 1).astype(np.int32)
    qk = q_cw[obs_kf].reshape(-1, 4)
    tk = t_cw[obs_kf].reshape(-1, 3)
    pc = np.asarray(se3.apply(jnp.asarray(qk), jnp.asarray(tk),
                              jnp.asarray(np.repeat(pw, M, 0))))
    z = pc[:, 2]
    u = cam.fx * pc[:, 0] / np.maximum(z, 1e-3) + cam.cx
    v = cam.fy * pc[:, 1] / np.maximum(z, 1e-3) + cam.cy
    ur = u - cam.bf / np.maximum(z, 1e-3)
    ok = (z > 0.5) & (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
    noise = rng.normal(0, 0.5, (len(u), 3))
    obs_uvr = (np.stack([u, v, ur], -1) + noise).astype(np.float32)

    # perturb initial estimates so LM has real work
    dq, dt = se3.se3_exp(jnp.asarray(rng.normal(0, 0.005, (K, 6)), jnp.float32))
    q0, t0 = se3.compose(dq, dt, jnp.asarray(q_cw), jnp.asarray(t_cw))
    pw0 = pw + rng.normal(0, 0.05, pw.shape).astype(np.float32)

    prob = BAProblem(
        q=q0, t=t0,
        pose_valid=jnp.ones(K, bool),
        pose_fixed=jnp.zeros(K, bool).at[0].set(True),
        pw=jnp.asarray(pw0),
        point_valid=jnp.ones(P, bool),
        obs_kf=jnp.asarray(obs_kf),
        obs_uvr=jnp.asarray(obs_uvr.reshape(P, M, 3)),
        obs_inv_sigma2=jnp.ones((P, M), jnp.float32),
        obs_stereo=jnp.ones((P, M), bool),
        obs_mask=jnp.asarray(ok.reshape(P, M)),
    )
    return prob, cam


def main():
    import jax
    from multiagent_orb_slam2_tpu.optim.ba import ba_solve_fast as ba_solve

    prob, cam = build_problem()
    print(f"devices: {jax.devices()}", file=sys.stderr)

    t0 = time.perf_counter()
    res = ba_solve(prob, cam, n_iters=10, chunk=4096)
    jax.block_until_ready(res)
    compile_s = time.perf_counter() - t0
    print(f"first call (incl. compile): {compile_s:.1f}s", file=sys.stderr)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = ba_solve(prob, cam, n_iters=10, chunk=4096)
        jax.block_until_ready(res)
        times.append(time.perf_counter() - t0)
    ms = min(times) * 1000.0
    print(f"steady-state GBA times (ms): {[f'{t*1000:.1f}' for t in times]}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "global_ba_10iter_ms_kitti00_split_scale",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(REF_GBA_MS / ms, 2),
    }))


if __name__ == "__main__":
    main()
