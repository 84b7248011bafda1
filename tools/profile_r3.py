"""Round-3 phase profile of ba_solve_fast on the bench problem (K=256,
P=64k, E=512k). Times one LM iteration at pcg_iters in {32, 1} plus the
obs-terms pass, to separate assembly cost from PCG cost.
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import build_problem  # noqa: E402
from multiagent_orb_slam2_tpu.optim import ba as ba_mod  # noqa: E402
from multiagent_orb_slam2_tpu.optim import ba_kernels as bk  # noqa: E402


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000


def main():
    prob, cam = build_problem()
    pre = ba_mod._prepare_e(prob)
    q, t, pw = prob.q, prob.t, prob.pw
    lam = jnp.asarray(1e-4)

    f32 = jax.jit(lambda q, t, pw, lam: ba_mod._build_and_solve_fast(
        prob, pre, q, t, pw, cam, lam, 5.991, 7.815, True, 4096, 32))
    print(f"build+solve pcg=32: {timeit(f32, q, t, pw, lam):.2f} ms",
          flush=True)

    f1 = jax.jit(lambda q, t, pw, lam: ba_mod._build_and_solve_fast(
        prob, pre, q, t, pw, cam, lam, 5.991, 7.815, True, 4096, 1))
    print(f"build+solve pcg=1:  {timeit(f1, q, t, pw, lam):.2f} ms",
          flush=True)

    kf_e, active, obs_uvr_t, inv_sigma2_e, stereo_e = pre
    f_obs = jax.jit(lambda q, t, pw: bk.obs_terms_e(
        kf_e, obs_uvr_t, inv_sigma2_e, stereo_e, active, q, t, pw, cam,
        5.991, 7.815, True))
    print(f"obs_terms_e alone:  {timeit(f_obs, q, t, pw):.2f} ms", flush=True)

    f_cost = jax.jit(lambda q, t, pw: bk.cost_e(
        kf_e, obs_uvr_t, inv_sigma2_e, stereo_e, active, q, t, pw, cam,
        5.991, 7.815, True))
    print(f"cost_e alone:       {timeit(f_cost, q, t, pw):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
