"""True in-jit per-phase costs of the BA build, measured with N-iteration
fori_loops (tiny carried outputs so nothing big leaves the device).

Phases:
  obs    : obs_terms_e (reduced to scalar)
  prep   : point blocks + Wb/Y/Hterms elementwise prep
  asm32  : current f32 one-hot assembly scan
  asm16  : same with bf16 one-hot + bf16 U/V matmuls (f32 accum)
  scat   : honest scatter-add pose reduce inside a fake CG loop
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import build_problem  # noqa: E402
from multiagent_orb_slam2_tpu.optim import ba as ba_mod  # noqa: E402
from multiagent_orb_slam2_tpu.optim import ba_kernels as bk  # noqa: E402

N = 20


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
    pre = ba_mod._prepare_e(prob)
    kf_e, active, obs_uvr_t, inv_sigma2_e, stereo_e = pre
    q, t, pw = prob.q, prob.t, prob.pw
    K = q.shape[0]
    P, M = prob.obs_kf.shape
    E = P * M
    KK = K + 1

    base = timeit(jax.jit(lambda q: q + 1.0), q)
    print(f"dispatch floor: {base:.2f} ms", flush=True)

    # --- obs terms loop ---
    def obs_loop(q, t, pw):
        def it(i, acc):
            tm = bk.obs_terms_e(kf_e, obs_uvr_t, inv_sigma2_e, stereo_e,
                                active, q + acc * 1e-20, t, pw, cam,
                                5.991, 7.815, True)
            return acc + tm.cost
        return jax.lax.fori_loop(0, N, it, 0.0)

    t_ms = timeit(jax.jit(obs_loop), q, t, pw)
    print(f"obs_terms_e: {(t_ms - base) / N:.3f} ms/iter", flush=True)

    # --- full build+solve loop (pcg=32) ---
    def full_loop(q, t, pw):
        def it(i, acc):
            dc, dp, c = ba_mod._build_and_solve_fast(
                prob, pre, q + acc * 1e-20, t, pw, cam, jnp.asarray(1e-4),
                5.991, 7.815, True, 4096, 32)
            return acc + c + jnp.sum(dc) + jnp.sum(dp)
        return jax.lax.fori_loop(0, N, it, 0.0)

    t_ms = timeit(jax.jit(full_loop), q, t, pw)
    print(f"full build+solve(pcg32): {(t_ms - base) / N:.3f} ms/iter",
          flush=True)

    # --- scatter-add pose reduce in a fake CG loop (honest: v evolves) ---
    rng = np.random.default_rng(0)
    Wb0 = jnp.asarray(rng.normal(size=(6, 3, E)).astype(np.float32) * 0.01)
    Hinv0 = jnp.asarray(rng.normal(size=(6, P)).astype(np.float32) * 0.01)
    kf_req = jnp.asarray(np.asarray(prob.obs_kf).reshape(E))
    kf_clip = jnp.clip(kf_req, 0, K - 1)

    def cg_scat_loop(v0):
        def it(i, v):
            vE = jnp.take(v.T, kf_clip, axis=1)              # [6, E]
            a = jnp.stack([sum(Wb0[j, c] * vE[j] for j in range(6))
                           for c in range(3)])
            s = a.reshape(3, P, M).sum(-1)
            h0 = Hinv0[0] * s[0] + Hinv0[1] * s[1] + Hinv0[2] * s[2]
            h1 = Hinv0[1] * s[0] + Hinv0[3] * s[1] + Hinv0[4] * s[2]
            h2 = Hinv0[2] * s[0] + Hinv0[4] * s[1] + Hinv0[5] * s[2]
            hE = jnp.stack([jnp.repeat(h0, M), jnp.repeat(h1, M),
                            jnp.repeat(h2, M)])
            b = jnp.stack([sum(Wb0[j, c] * hE[c] for c in range(3))
                           for j in range(6)])               # [6, E]
            y = jnp.zeros((KK, 6), jnp.float32).at[kf_clip].add(b.T)
            return v * 0.5 + y[:K] * 0.5
        return jax.lax.fori_loop(0, N, it, v0)

    v0 = jnp.asarray(rng.normal(size=(K, 6)).astype(np.float32))
    t_ms = timeit(jax.jit(cg_scat_loop), v0)
    print(f"matrix-free matvec w/ scatter: {(t_ms - base) / N:.3f} ms/iter",
          flush=True)

    # --- bf16 variant of the assembly scan, one LM iter ---
    def asm16(q, t, pw, lam):
        tm = bk.obs_terms_e(kf_e, obs_uvr_t, inv_sigma2_e, stereo_e, active,
                            q, t, pw, cam, 5.991, 7.815, True)
        Jc, Jp, r, w = tm.Jc, tm.Jp, tm.r, tm.w
        JpP = Jp.reshape(3, 3, P, M)
        wP = w.reshape(P, M)

        def hpp(a, b):
            return jnp.sum((JpP[0, a] * JpP[0, b] + JpP[1, a] * JpP[1, b]
                            + JpP[2, a] * JpP[2, b]) * wP, -1)

        H6 = (hpp(0, 0), hpp(0, 1), hpp(0, 2), hpp(1, 1), hpp(1, 2),
              hpp(2, 2))
        Hinv6 = bk.sym3_inv(H6, lam)
        Wb = jnp.stack([jnp.stack([
            (Jc[0, a] * Jp[0, c] + Jc[1, a] * Jp[1, c]
             + Jc[2, a] * Jp[2, c]) * w
            for c in range(3)]) for a in range(6)])
        Hfull = {(0, 0): Hinv6[0], (0, 1): Hinv6[1], (0, 2): Hinv6[2],
                 (1, 0): Hinv6[1], (1, 1): Hinv6[3], (1, 2): Hinv6[4],
                 (2, 0): Hinv6[2], (2, 1): Hinv6[4], (2, 2): Hinv6[5]}
        HinvE = {k: jnp.repeat(v, M) for k, v in Hfull.items()}
        Y = jnp.stack([jnp.stack([
            Wb[a, 0] * HinvE[(0, c)] + Wb[a, 1] * HinvE[(1, c)]
            + Wb[a, 2] * HinvE[(2, c)] for c in range(3)]) for a in range(6)])

        chunk = 4096
        n_chunks = P // chunk
        cp = chunk
        ce = cp * M
        kf_masked = jnp.where(active > 0, kf_e, K).reshape(n_chunks, ce)
        Y_c = jnp.moveaxis(Y.reshape(6, 3, n_chunks, ce), 2, 0)
        Wb_c = jnp.moveaxis(Wb.reshape(6, 3, n_chunks, ce), 2, 0)

        def body(S_acc, inp):
            kf_i, Y_i, Wb_i = inp
            Of = jax.nn.one_hot(kf_i, KK, dtype=jnp.bfloat16)
            O3 = Of.reshape(cp, M, KK)
            Y3 = Y_i.reshape(6, 3, cp, M).transpose(2, 1, 0, 3).reshape(
                cp, 18, M).astype(jnp.bfloat16)
            W3 = Wb_i.reshape(6, 3, cp, M).transpose(2, 1, 0, 3).reshape(
                cp, 18, M).astype(jnp.bfloat16)
            U = jax.lax.dot_general(Y3, O3, (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.bfloat16)
            V = jax.lax.dot_general(W3, O3, (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.bfloat16)
            U2 = U.reshape(cp * 3, 6 * KK)
            V2 = V.reshape(cp * 3, 6 * KK)
            S_acc = S_acc + jax.lax.dot_general(
                U2, V2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return S_acc, None

        S0 = jnp.zeros((6 * KK, 6 * KK), jnp.float32)
        S_flat, _ = jax.lax.scan(body, S0, (kf_masked, Y_c, Wb_c))
        return S_flat

    def asm16_loop(q, t, pw):
        def it(i, acc):
            S = asm16(q + acc * 1e-20, t, pw, jnp.asarray(1e-4))
            return acc + jnp.sum(S[:6, :6])
        return jax.lax.fori_loop(0, N, it, 0.0)

    t_ms = timeit(jax.jit(asm16_loop), q, t, pw)
    print(f"bf16 S assembly (obs+prep+scan): {(t_ms - base) / N:.3f} ms/iter",
          flush=True)


if __name__ == "__main__":
    main()
