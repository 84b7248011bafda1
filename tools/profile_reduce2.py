"""In-jit microbenchmark: loop each primitive N times inside one program to
amortize the ~25 ms axon dispatch latency. Reports per-iteration cost.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

E = 512 * 1024
K = 256
KK = K + 1
N = 50


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
    rng = np.random.default_rng(0)
    kf = jnp.asarray(rng.integers(0, K, E).astype(np.int32))
    bT = jnp.asarray(rng.normal(size=(6, E)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(K, 6)).astype(np.float32))

    # dispatch floor
    f0 = jax.jit(lambda v: v + 1.0)
    base = timeit(f0, v)
    print(f"dispatch floor:            {base:.2f} ms", flush=True)

    def loop(body):
        def run(v, bT, kf):
            def it(i, carry):
                y = body(carry, bT, kf)
                return y
            return jax.lax.fori_loop(0, N, it, v)
        return jax.jit(run)

    # forward gather only: vE = v.T[:, kf] then cheap reduce back via sum
    def fwd(vc, bT, kf):
        vE = jnp.take(vc.T, kf, axis=1)            # [6, E]
        return vc + jnp.sum(vE * bT, axis=1)[None, :].reshape(1, 6)

    t = timeit(loop(fwd), v, bT, kf)
    print(f"fwd gather + reduce-all:   {(t - base) / N:.3f} ms/iter",
          flush=True)

    # scatter-add
    def scat(vc, bT, kf):
        vE = jnp.take(vc.T, kf, axis=1) * 0.1 + bT
        y = jnp.zeros((KK, 6), jnp.float32).at[kf].add(vE.T)
        return y[:K]

    t = timeit(loop(scat), v, bT, kf)
    print(f"fwd gather + scatter-add:  {(t - base) / N:.3f} ms/iter",
          flush=True)

    # gatherC table
    kf_np = np.asarray(kf)
    order = np.argsort(kf_np, kind="stable")
    counts = np.bincount(kf_np, minlength=K)
    C = (int(counts.max()) + 127) // 128 * 128
    idx = np.full((K, C), E, np.int32)
    off = 0
    for k in range(K):
        idx[k, :counts[k]] = order[off:off + counts[k]]
        off += counts[k]
    idx_j = jnp.asarray(idx.reshape(-1))

    def gatc(vc, bT, kf):
        vE = jnp.take(vc.T, kf, axis=1) * 0.1 + bT        # [6, E]
        vEp = jnp.concatenate([vE, jnp.zeros((6, 1))], axis=1)
        y = jnp.take(vEp, idx_j, axis=1).reshape(6, K, C).sum(-1)
        return y.T

    t = timeit(loop(gatc), v, bT, kf)
    print(f"fwd gather + gatherC(C={C}): {(t - base) / N:.3f} ms/iter",
          flush=True)

    # row-major gatherC: work in [E, 6] layout
    def gatc_rows(vc, bT, kf):
        vE = jnp.take(vc, kf, axis=0) * 0.1 + bT.T        # [E, 6]
        vEp = jnp.concatenate([vE, jnp.zeros((1, 6))], axis=0)
        y = jnp.take(vEp, idx_j, axis=0).reshape(K, C, 6).sum(1)
        return y

    t = timeit(loop(gatc_rows), v, bT, kf)
    print(f"row gather + gatherC rows: {(t - base) / N:.3f} ms/iter",
          flush=True)

    # one-hot chunked matmul reduce
    def oh(vc, bT, kf):
        vE = jnp.take(vc.T, kf, axis=1) * 0.1 + bT
        n_chunks = 16
        ce = E // n_chunks
        kf_c = kf.reshape(n_chunks, ce)
        b_c = jnp.moveaxis(vE.reshape(6, n_chunks, ce), 1, 0)

        def body(acc, inp):
            kf_i, b_i = inp
            Of = jax.nn.one_hot(kf_i, KK, dtype=jnp.float32)
            return acc + jax.lax.dot_general(
                b_i, Of, (((1,), (0,)), ((), ()))), None

        acc, _ = jax.lax.scan(body, jnp.zeros((6, KK)), (kf_c, b_c))
        return acc[:, :K].T

    t = timeit(loop(oh), v, bT, kf)
    print(f"fwd gather + onehot matmul: {(t - base) / N:.3f} ms/iter",
          flush=True)

    # full matrix-free matvec shape: fwd gather, 18-comp mults, point reduce,
    # expand, 18-comp mults, pose reduce (gatherC)
    P = E // 8
    M = 8
    Wb = jnp.asarray(rng.normal(size=(6, 3, E)).astype(np.float32))
    Hinv = jnp.asarray(rng.normal(size=(6, P)).astype(np.float32))

    def matvec(vc, bT, kf):
        vE = jnp.take(vc.T, kf, axis=1)                   # [6, E]
        a = jnp.stack([sum(Wb[j, c] * vE[j] for j in range(6))
                       for c in range(3)])                # [3, E]
        s = a.reshape(3, P, M).sum(-1)                    # [3, P]
        h0 = Hinv[0] * s[0] + Hinv[1] * s[1] + Hinv[2] * s[2]
        h1 = Hinv[1] * s[0] + Hinv[3] * s[1] + Hinv[4] * s[2]
        h2 = Hinv[2] * s[0] + Hinv[4] * s[1] + Hinv[5] * s[2]
        hE = jnp.stack([jnp.repeat(h0, M), jnp.repeat(h1, M),
                        jnp.repeat(h2, M)])               # [3, E]
        b = jnp.stack([sum(Wb[j, c] * hE[c] for c in range(3))
                       for j in range(6)])                # [6, E]
        bp = jnp.concatenate([b, jnp.zeros((6, 1))], axis=1)
        y = jnp.take(bp, idx_j, axis=1).reshape(6, K, C).sum(-1)
        return y.T

    t = timeit(loop(matvec), v, bT, kf)
    print(f"FULL matrix-free matvec:   {(t - base) / N:.3f} ms/iter",
          flush=True)


if __name__ == "__main__":
    main()
