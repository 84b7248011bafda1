"""Fine-grained in-loop breakdown of _build_and_solve_fast phases."""
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


def phases(prob, pre, q, t, pw, cam, lam, upto, band_R=None):
    """Replicates _build_and_solve_fast up to a phase, returns tiny scalar."""
    K = q.shape[0]
    P, M = prob.obs_kf.shape
    E = P * M
    KK = K + 1
    kf_e, active, obs_uvr_t, inv_sigma2_e, stereo_e = pre
    tm = bk.obs_terms_e(kf_e, obs_uvr_t, inv_sigma2_e, stereo_e, active,
                        q, t, pw, cam, 5.991, 7.815, True)
    Jc, Jp, r, w = tm.Jc, tm.Jp, tm.r, tm.w
    if upto == "obs":
        return tm.cost
    JpP = Jp.reshape(3, 3, P, M)
    wP = w.reshape(P, M)
    rP = r.reshape(3, P, M)

    def hpp(a, b):
        return jnp.sum((JpP[0, a] * JpP[0, b] + JpP[1, a] * JpP[1, b]
                        + JpP[2, a] * JpP[2, b]) * wP, -1)

    H6 = (hpp(0, 0), hpp(0, 1), hpp(0, 2), hpp(1, 1), hpp(1, 2), hpp(2, 2))
    Hinv6 = bk.sym3_inv(H6, lam)
    bp = jnp.stack([
        -jnp.sum((JpP[0, b] * rP[0] + JpP[1, b] * rP[1]
                  + JpP[2, b] * rP[2]) * wP, -1) for b in range(3)])
    if upto == "pts":
        return tm.cost + jnp.sum(bp) + jnp.sum(Hinv6[0])
    Wb = jnp.stack([jnp.stack([
        (Jc[0, a] * Jp[0, c] + Jc[1, a] * Jp[1, c] + Jc[2, a] * Jp[2, c]) * w
        for c in range(3)]) for a in range(6)])
    Hfull = {(0, 0): Hinv6[0], (0, 1): Hinv6[1], (0, 2): Hinv6[2],
             (1, 0): Hinv6[1], (1, 1): Hinv6[3], (1, 2): Hinv6[4],
             (2, 0): Hinv6[2], (2, 1): Hinv6[4], (2, 2): Hinv6[5]}
    HinvE = {k: jnp.repeat(v, M) for k, v in Hfull.items()}
    Y = jnp.stack([jnp.stack([
        Wb[a, 0] * HinvE[(0, c)] + Wb[a, 1] * HinvE[(1, c)]
        + Wb[a, 2] * HinvE[(2, c)] for c in range(3)]) for a in range(6)])
    if upto == "wby":
        return tm.cost + jnp.sum(Y[0, 0]) + jnp.sum(Wb[0, 0])
    Hterms = jnp.stack([
        (Jc[0, a] * Jc[0, b] + Jc[1, a] * Jc[1, b] + Jc[2, a] * Jc[2, b]) * w
        for a in range(6) for b in range(6)])
    bterms = jnp.stack([
        -(Jc[0, a] * r[0] + Jc[1, a] * r[1] + Jc[2, a] * r[2]) * w
        for a in range(6)])
    Ybp_e = jnp.stack([
        Y[a, 0] * jnp.repeat(bp[0], M) + Y[a, 1] * jnp.repeat(bp[1], M)
        + Y[a, 2] * jnp.repeat(bp[2], M) for a in range(6)])
    if upto == "terms":
        return (tm.cost + jnp.sum(Hterms[0]) + jnp.sum(bterms[0])
                + jnp.sum(Ybp_e[0]) + jnp.sum(Y[0, 0]) + jnp.sum(Wb[0, 0]))
    # scan (full width)
    n_chunks = 16
    cp = P // n_chunks
    ce = cp * M
    kf_masked = jnp.where(active > 0, kf_e, K).reshape(n_chunks, ce)
    Y_c = jnp.moveaxis(Y.reshape(6, 3, n_chunks, ce), 2, 0)
    Ht_c = jnp.moveaxis(Hterms.reshape(36, n_chunks, ce), 1, 0)
    bt_c = jnp.moveaxis(bterms.reshape(6, n_chunks, ce), 1, 0)
    Ybp_c = jnp.moveaxis(Ybp_e.reshape(6, n_chunks, ce), 1, 0)
    Wb_c = jnp.moveaxis(Wb.reshape(6, 3, n_chunks, ce), 2, 0)

    if band_R is None:
        def body(carry, inp):
            kf_i, Y_i, Wb_i, Ht_i, bt_i, Ybp_i = inp
            return ba_mod._full_chunk(carry, kf_i, Y_i, Wb_i, Ht_i, bt_i,
                                      Ybp_i, KK, cp, M), None

        carry0 = (jnp.zeros((6 * KK, 6 * KK)), jnp.zeros((6, KK)),
                  jnp.zeros((36, KK)), jnp.zeros((6, KK)))
        (S_a, rhs_p, Hcc_f, bc_f), _ = jax.lax.scan(
            body, carry0, (kf_masked, Y_c, Wb_c, Ht_c, bt_c, Ybp_c))
        return tm.cost + jnp.sum(S_a[:6, :6]) + jnp.sum(Hcc_f[0])
    else:
        R = band_R
        kfP = jnp.where(active > 0, kf_e, K).reshape(P, M)
        actP = active.reshape(P, M) > 0
        kf_max = jnp.max(jnp.where(actP, kfP, -1), axis=1)
        kf_min = jnp.min(kfP, axis=1)
        base_c = jnp.clip(jnp.min(kf_min.reshape(n_chunks, cp), axis=1),
                          0, K - R)
        has_act = jnp.any(actP, axis=1)
        in_band = (kf_max < jnp.repeat(base_c, cp) + R) | ~has_act
        inb_c = in_band.reshape(n_chunks, cp)

        def body(carry, inp):
            S_acc, rhs_acc, Hcc_acc, bc_acc = carry
            kf_i, Y_i, Wb_i, Ht_i, bt_i, Ybp_i, base_i, inb_i = inp
            okp = jnp.repeat(inb_i, M) & (kf_i < K)
            rel = jnp.where(okp, kf_i - base_i, R)
            Of = jax.nn.one_hot(rel, R + 1, dtype=jnp.float32)
            Hcc_l = jax.lax.dot_general(
                Ht_i, Of, (((1,), (0,)), ((), ())))[:, :R]
            bc_l = jax.lax.dot_general(
                bt_i, Of, (((1,), (0,)), ((), ())))[:, :R]
            rhs_l = jax.lax.dot_general(
                Ybp_i, Of, (((1,), (0,)), ((), ())))[:, :R]

            def addc(acc, patch):
                cur = jax.lax.dynamic_slice(
                    acc, (0, base_i), (acc.shape[0], R))
                return jax.lax.dynamic_update_slice(
                    acc, cur + patch, (0, base_i))

            Hcc_acc = addc(Hcc_acc, Hcc_l)
            bc_acc = addc(bc_acc, bc_l)
            rhs_acc = addc(rhs_acc, rhs_l)
            O3 = Of.reshape(cp, M, R + 1)
            Y3 = Y_i.reshape(6, 3, cp, M).transpose(2, 1, 0, 3).reshape(
                cp, 18, M)
            W3 = Wb_i.reshape(6, 3, cp, M).transpose(2, 1, 0, 3).reshape(
                cp, 18, M)
            U = jax.lax.dot_general(Y3, O3, (((2,), (1,)), ((0,), (0,))))
            V = jax.lax.dot_general(W3, O3, (((2,), (1,)), ((0,), (0,))))
            U2 = U.reshape(cp * 3, 6 * (R + 1))
            V2 = V.reshape(cp * 3, 6 * (R + 1))
            S_l = jax.lax.dot_general(U2, V2, (((0,), (0,)), ((), ())))
            S_l = S_l.reshape(6, R + 1, 6, R + 1).transpose(
                1, 0, 3, 2).reshape(6 * (R + 1), 6 * (R + 1))[:6 * R, :6 * R]
            cur = jax.lax.dynamic_slice(
                S_acc, (6 * base_i, 6 * base_i), (6 * R, 6 * R))
            S_acc = jax.lax.dynamic_update_slice(
                S_acc, cur + S_l, (6 * base_i, 6 * base_i))
            return (S_acc, rhs_acc, Hcc_acc, bc_acc), None

        carry0 = (jnp.zeros((6 * KK, 6 * KK)), jnp.zeros((6, KK)),
                  jnp.zeros((36, KK)), jnp.zeros((6, KK)))
        (S_k, rhs_p, Hcc_f, bc_f), _ = jax.lax.scan(
            body, carry0,
            (kf_masked, Y_c, Wb_c, Ht_c, bt_c, Ybp_c, base_c, inb_c))
        return tm.cost + jnp.sum(S_k[:6, :6]) + jnp.sum(Hcc_f[0])


def main():
    prob, cam = build_problem()
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
    lam = jnp.asarray(1e-4)

    base = timeit(jax.jit(lambda q: q + 1.0), q)
    print(f"dispatch floor: {base:.2f} ms", flush=True)

    def loop(upto, band_R=None):
        def run(q, t, pw):
            def it(i, acc):
                return acc + phases(prob, pre, q + acc * 1e-20, t, pw, cam,
                                    lam, upto, band_R)
            return jax.lax.fori_loop(0, N, it, 0.0)
        return jax.jit(run)

    for name, args in [("obs", ("obs", None)), ("pts", ("pts", None)),
                       ("wby", ("wby", None)), ("terms", ("terms", None)),
                       ("scan-full", ("scan", None)),
                       ("scan-banded", ("scan", 64))]:
        t_ms = timeit(loop(*args), q, t, pw)
        print(f"{name:12s}: {(t_ms - base) / N:.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
