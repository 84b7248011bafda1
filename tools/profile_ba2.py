"""Per-phase profiling of ba_solve_fast — explicit-arg jits only."""
import sys
import time
import functools

import numpy as np
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


prob, cam = build_problem()
q, t, pw = prob.q, prob.t, prob.pw
lam = jnp.asarray(1e-4)
K = q.shape[0]
P, M = prob.obs_kf.shape
E = P * M
KK = K + 1


@functools.partial(jax.jit, static_argnames=("pcg_iters",))
def one_iter(prob, q, t, pw, lam, pcg_iters=32):
    pre = ba_mod._prepare_e(prob)
    return ba_mod._build_and_solve_fast(prob, pre, q, t, pw, cam, lam,
                                        5.991, 7.815, True, 4096, pcg_iters)


print(f"1 LM iter (pcg=32): {timeit(one_iter, prob, q, t, pw, lam):.2f} ms")
f1 = functools.partial(one_iter, pcg_iters=1)
print(f"1 LM iter (pcg=1):  {timeit(f1, prob, q, t, pw, lam):.2f} ms")


@jax.jit
def obs_only(prob, q, t, pw):
    pre = ba_mod._prepare_e(prob)
    kf_e, active, obs_uvr_t, inv_sigma2_e, stereo_e = pre
    return bk.obs_terms_e(kf_e, obs_uvr_t, inv_sigma2_e, stereo_e, active,
                          q, t, pw, cam, 5.991, 7.815, True)


print(f"obs_terms_e:        {timeit(obs_only, prob, q, t, pw):.2f} ms")


@jax.jit
def cost_only(prob, q, t, pw):
    pre = ba_mod._prepare_e(prob)
    kf_e, active, obs_uvr_t, inv_sigma2_e, stereo_e = pre
    return bk.cost_e(kf_e, obs_uvr_t, inv_sigma2_e, stereo_e, active,
                     q, t, pw, cam, 5.991, 7.815, True)


print(f"cost_e:             {timeit(cost_only, prob, q, t, pw):.2f} ms")


# everything except PCG solve: hack — run with pcg_iters=0
f0 = functools.partial(one_iter, pcg_iters=0)
try:
    print(f"1 LM iter (pcg=0):  {timeit(f0, prob, q, t, pw, lam):.2f} ms")
except Exception as e:
    print("pcg=0 failed:", e)


# PCG alone, explicit args
@functools.partial(jax.jit, static_argnames=("n",))
def pcg(S, r, Di, n=32):
    return bk.pcg_solve(S, r, Di, n)


rng = np.random.default_rng(0)
D = 6 * K
A = jnp.asarray(rng.normal(size=(D, D)), jnp.float32)
S = A @ A.T + 10.0 * jnp.eye(D)
rhs = jnp.asarray(rng.normal(size=D), jnp.float32)
Di = jnp.linalg.inv(S.reshape(K, 6, K, 6)[jnp.arange(K), :, jnp.arange(K), :])
print(f"pcg 32 iters:       {timeit(pcg, S, rhs, Di):.2f} ms")
print(f"pcg 8 iters:        {timeit(functools.partial(pcg, n=8), S, rhs, Di):.2f} ms")

# full solve at different pcg_iters
for pi in (8, 16, 32):
    f = functools.partial(ba_mod.ba_solve_fast, n_iters=10, chunk=4096,
                          pcg_iters=pi)
    print(f"full 10-iter solve pcg={pi}: {timeit(f, prob, cam):.2f} ms")
