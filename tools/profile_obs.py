"""Bisect obs_terms_e cost: time with parts of the output DCE'd away."""
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


prob, cam = build_problem()
pre = ba_mod._prepare_e(prob)
kf_e, active, obs_uvr_t, inv_sigma2_e, stereo_e = pre
q, t, pw = prob.q, prob.t, prob.pw

full = lambda q, t, pw: bk.obs_terms_e(
    kf_e, obs_uvr_t, inv_sigma2_e, stereo_e, active, q, t, pw, cam,
    5.991, 7.815, True)

for name, pick in [
    ("cost only", lambda o: o.cost),
    ("r only", lambda o: o.r),
    ("r+w", lambda o: (o.r, o.w)),
    ("Jc only", lambda o: o.Jc),
    ("Jp only", lambda o: o.Jp),
    ("Jc+Jp", lambda o: (o.Jc, o.Jp)),
    ("everything", lambda o: o),
]:
    f = jax.jit(lambda q, t, pw, p=pick: p(full(q, t, pw)))
    print(f"{name:<12}: {timeit(f, q, t, pw):.3f} ms")

# is it the stereo_e where? the active float mult? sizes?
print("E =", kf_e.shape, "dtype kf", kf_e.dtype, "uvr", obs_uvr_t.shape,
      obs_uvr_t.dtype, "active", active.dtype)

# scaling: slice the problem to E/4
E = kf_e.shape[0]
P, M = prob.obs_kf.shape
sl = lambda a: a[..., : E // 4] if a.shape[-1] == E else a
pw4 = pw[: P // 4]
f4 = jax.jit(lambda q, t, pw4: bk.obs_terms_e(
    sl(kf_e), sl(obs_uvr_t), sl(inv_sigma2_e), sl(stereo_e), sl(active),
    q, t, pw4, cam, 5.991, 7.815, True))
print(f"everything at E/4: {timeit(f4, q, t, pw4):.3f} ms")
