"""Locate the cost in the banded build: in-loop per-iter timings of the
full vs banded _build_and_solve_fast and of isolated sub-phases."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import build_problem  # noqa: E402
from multiagent_orb_slam2_tpu.optim import ba as ba_mod  # noqa: E402
from multiagent_orb_slam2_tpu.optim import ba_kernels as bk  # noqa: E402

N = 10


def timeit(fn, *args, n=4):
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
    # sort points by min kf like ba_solve_fast does
    okm = prob.obs_mask & (prob.obs_kf >= 0)
    K = prob.q.shape[0]
    kf_min = jnp.min(jnp.where(okm, prob.obs_kf, K + 1), axis=1)
    perm = jnp.argsort(kf_min)
    prob = prob._replace(
        pw=prob.pw[perm], point_valid=prob.point_valid[perm],
        obs_kf=prob.obs_kf[perm], obs_uvr=prob.obs_uvr[perm],
        obs_inv_sigma2=prob.obs_inv_sigma2[perm],
        obs_stereo=prob.obs_stereo[perm], obs_mask=prob.obs_mask[perm])
    pre = ba_mod._prepare_e(prob)
    q, t, pw = prob.q, prob.t, prob.pw
    P, M = prob.obs_kf.shape

    base = timeit(jax.jit(lambda q: q + 1.0), q)
    print(f"dispatch floor: {base:.2f} ms", flush=True)

    # check overflow count
    kf_e = pre[0]
    active = pre[1]
    n_chunks = 16
    cp = P // n_chunks
    kfP = jnp.where(active > 0, kf_e, K).reshape(P, M)
    actP = active.reshape(P, M) > 0
    kf_max = jnp.max(jnp.where(actP, kfP, -1), axis=1)
    kf_minP = jnp.min(kfP, axis=1)
    base_c = jnp.clip(jnp.min(kf_minP.reshape(n_chunks, cp), axis=1),
                      0, K - 64)
    has_act = jnp.any(actP, axis=1)
    in_band = (kf_max < jnp.repeat(base_c, cp) + 64) | ~has_act
    print(f"n_overflow = {int(jnp.sum(~in_band))} / {P}", flush=True)

    def loop_build(band):
        def run(q, t, pw):
            def it(i, acc):
                dc, dp, c = ba_mod._build_and_solve_fast(
                    prob, pre, q + acc * 1e-20, t, pw, cam,
                    jnp.asarray(1e-4), 5.991, 7.815, True, 4096, 32,
                    band=band)
                return acc + c + jnp.sum(dc) + jnp.sum(dp)
            return jax.lax.fori_loop(0, N, it, 0.0)
        return jax.jit(run)

    t_ms = timeit(loop_build(None), q, t, pw)
    print(f"build full:   {(t_ms - base) / N:.3f} ms/iter", flush=True)
    t_ms = timeit(loop_build((64, 4096)), q, t, pw)
    print(f"build banded: {(t_ms - base) / N:.3f} ms/iter", flush=True)
    t_ms = timeit(loop_build((64, 256)), q, t, pw)
    print(f"build banded OC=256: {(t_ms - base) / N:.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
