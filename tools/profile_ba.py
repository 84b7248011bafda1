"""Per-phase profiling of ba_solve_fast on the bench problem.

Ablations (each jitted separately, steady-state timed):
  obs    : obs_terms_e + point blocks + Wb/Y/Hterms elementwise prep
  asm    : the chunked one-hot MXU assembly scan (S + Hcc + rhs)
  pcg    : PCG solve of the assembled system (32 iters)
  full1  : one complete _build_and_solve_fast
  pcgN   : full solve with pcg_iters in {1, 8, 32}
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

    # full build+solve, one LM iteration
    f_full = jax.jit(lambda q, t, pw, lam: ba_mod._build_and_solve_fast(
        prob, pre, q, t, pw, cam, lam, 5.991, 7.815, True, 4096, 32))
    print(f"full build+solve (1 LM iter): {timeit(f_full, q, t, pw, lam):.2f} ms")

    f_full1 = jax.jit(lambda q, t, pw, lam: ba_mod._build_and_solve_fast(
        prob, pre, q, t, pw, cam, lam, 5.991, 7.815, True, 4096, 1))
    print(f"full build+solve (pcg=1):     {timeit(f_full1, q, t, pw, lam):.2f} ms")

    # obs terms alone
    kf_e, active, obs_uvr_t, inv_sigma2_e, stereo_e = pre
    f_obs = jax.jit(lambda q, t, pw: bk.obs_terms_e(
        kf_e, obs_uvr_t, inv_sigma2_e, stereo_e, active, q, t, pw, cam,
        5.991, 7.815, True))
    print(f"obs_terms_e alone:            {timeit(f_obs, q, t, pw):.2f} ms")

    # cost only
    f_cost = jax.jit(lambda q, t, pw: bk.cost_e(
        kf_e, obs_uvr_t, inv_sigma2_e, stereo_e, active, q, t, pw, cam,
        5.991, 7.815, True))
    print(f"cost_e alone:                 {timeit(f_cost, q, t, pw):.2f} ms")

    # isolate: everything up to but excluding the scan (monkeypatch via
    # reimplementation would drift; instead time scan-only with fixed inputs)
    K = q.shape[0]
    P, M = prob.obs_kf.shape
    E = P * M
    KK = K + 1
    import numpy as np
    rng = np.random.default_rng(0)
    Y = jnp.asarray(rng.normal(size=(6, 3, E)), jnp.float32)
    Wb = jnp.asarray(rng.normal(size=(6, 3, E)), jnp.float32)
    Ht = jnp.asarray(rng.normal(size=(36, E)), jnp.float32)
    bt = jnp.asarray(rng.normal(size=(6, E)), jnp.float32)
    Ybp = jnp.asarray(rng.normal(size=(6, E)), jnp.float32)
    kf_m = jnp.asarray(rng.integers(0, K, E), jnp.int32)

    def scan_only(kf_e, Y, Wb, Ht, bt, Ybp, chunk):
        n_chunks = max(P // chunk, 1)
        cp = P // n_chunks
        ce = cp * M
        kf_c = kf_e.reshape(n_chunks, ce)
        Y_c = Y.reshape(6, 3, n_chunks, ce)
        Wb_c = Wb.reshape(6, 3, n_chunks, ce)
        Ht_c = Ht.reshape(36, n_chunks, ce)
        bt_c = bt.reshape(6, n_chunks, ce)
        Ybp_c = Ybp.reshape(6, n_chunks, ce)

        def body(carry, inp):
            S_acc, rhs_acc, Hcc_acc, bc_acc = carry
            kf_i, Y_i, Wb_i, Ht_i, bt_i, Ybp_i = inp
            Of = jax.nn.one_hot(kf_i, KK, dtype=jnp.float32)
            Hcc_acc = Hcc_acc + jax.lax.dot_general(
                Ht_i, Of, (((1,), (0,)), ((), ())))
            bc_acc = bc_acc + jax.lax.dot_general(
                bt_i, Of, (((1,), (0,)), ((), ())))
            rhs_acc = rhs_acc + jax.lax.dot_general(
                Ybp_i, Of, (((1,), (0,)), ((), ())))
            O3 = Of.reshape(cp, M, KK)
            Y3 = Y_i.reshape(6, 3, cp, M).transpose(2, 1, 0, 3).reshape(
                cp, 18, M)
            W3 = Wb_i.reshape(6, 3, cp, M).transpose(2, 1, 0, 3).reshape(
                cp, 18, M)
            U = jax.lax.dot_general(Y3, O3, (((2,), (1,)), ((0,), (0,))))
            V = jax.lax.dot_general(W3, O3, (((2,), (1,)), ((0,), (0,))))
            U2 = U.reshape(cp * 3, 6 * KK)
            V2 = V.reshape(cp * 3, 6 * KK)
            S_acc = S_acc + jax.lax.dot_general(
                U2, V2, (((0,), (0,)), ((), ())))
            return (S_acc, rhs_acc, Hcc_acc, bc_acc), None

        S0 = jnp.zeros((6 * KK, 6 * KK))
        out, _ = jax.lax.scan(
            body, (S0, jnp.zeros((6, KK)), jnp.zeros((36, KK)),
                   jnp.zeros((6, KK))),
            (kf_c, jnp.moveaxis(Y_c, 2, 0), jnp.moveaxis(Wb_c, 2, 0),
             jnp.moveaxis(Ht_c, 1, 0), jnp.moveaxis(bt_c, 1, 0),
             jnp.moveaxis(Ybp_c, 1, 0)))
        return out

    for chunk in (4096, 8192, 16384):
        f_scan = jax.jit(lambda *a, c=chunk: scan_only(*a, c))
        print(f"assembly scan chunk={chunk}:   "
              f"{timeit(f_scan, kf_m, Y, Wb, Ht, bt, Ybp):.2f} ms")

    # scan without the big S matmul (Hcc/bc/rhs only)
    def scan_noS(kf_e, Ht, bt, Ybp, chunk):
        n_chunks = max(P // chunk, 1)
        ce = (P // n_chunks) * M
        kf_c = kf_e.reshape(n_chunks, ce)
        Ht_c = jnp.moveaxis(Ht.reshape(36, n_chunks, ce), 1, 0)
        bt_c = jnp.moveaxis(bt.reshape(6, n_chunks, ce), 1, 0)
        Ybp_c = jnp.moveaxis(Ybp.reshape(6, n_chunks, ce), 1, 0)

        def body(carry, inp):
            rhs_acc, Hcc_acc, bc_acc = carry
            kf_i, Ht_i, bt_i, Ybp_i = inp
            Of = jax.nn.one_hot(kf_i, KK, dtype=jnp.float32)
            Hcc_acc = Hcc_acc + jax.lax.dot_general(
                Ht_i, Of, (((1,), (0,)), ((), ())))
            bc_acc = bc_acc + jax.lax.dot_general(
                bt_i, Of, (((1,), (0,)), ((), ())))
            rhs_acc = rhs_acc + jax.lax.dot_general(
                Ybp_i, Of, (((1,), (0,)), ((), ())))
            return (rhs_acc, Hcc_acc, bc_acc), None

        out, _ = jax.lax.scan(
            body, (jnp.zeros((6, KK)), jnp.zeros((36, KK)),
                   jnp.zeros((6, KK))), (kf_c, Ht_c, bt_c, Ybp_c))
        return out

    f_noS = jax.jit(lambda kf, a, b, c: scan_noS(kf, a, b, c, 4096))
    print(f"assembly scan w/o S matmul:   "
          f"{timeit(f_noS, kf_m, Ht, bt, Ybp):.2f} ms")

    # PCG alone on a random SPD-ish system
    D = 6 * K
    A = jnp.asarray(rng.normal(size=(D, D)), jnp.float32)
    S = A @ A.T + 10.0 * jnp.eye(D)
    rhs = jnp.asarray(rng.normal(size=D), jnp.float32)
    Dinv = jnp.linalg.inv(S.reshape(K, 6, K, 6)[jnp.arange(K), :,
                                                jnp.arange(K), :])
    f_pcg = jax.jit(lambda S, r, Di: bk.pcg_solve(S, r, Di, 32))
    print(f"pcg_solve 32 iters:           {timeit(f_pcg, S, rhs, Dinv):.2f} ms")

    f_chol = jax.jit(lambda S, r: jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(S), r))
    print(f"dense cholesky solve:         {timeit(f_chol, S, rhs):.2f} ms")


if __name__ == "__main__":
    main()
