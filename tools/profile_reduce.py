"""Microbenchmark: pose-reduction primitives for the matrix-free Schur matvec.

The matvec needs y[K,6] = sum_e b[e,:] for obs e with kf_e == k, with
E=512k, K=256, ~40x per GBA solve. Candidates:
  scatter : jnp.zeros.at[kf].add  (XLA scatter-add)
  segsum  : jax.ops.segment_sum
  gatherC : precomputed [K, C] slot table, gather rows + sum over C
  onehot  : chunked one-hot matmul (round-2 assembly pattern)
  cumsum  : sort-order cumsum + boundary difference
Also times the forward gather vE = v[kf_e] from a tiny [K,6] table.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

E = 512 * 1024
K = 256
KK = K + 1


def timeit(fn, *args, n=10):
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
    b = jnp.asarray(rng.normal(size=(E, 6)).astype(np.float32))
    bT = jnp.asarray(np.asarray(b).T.copy())
    v = jnp.asarray(rng.normal(size=(K, 6)).astype(np.float32))

    # forward gather
    f_gather = jax.jit(lambda v, kf: jnp.take(v.T, kf, axis=1))
    print(f"fwd gather [6,K]->[6,E]: {timeit(f_gather, v, kf):.3f} ms",
          flush=True)

    # scatter-add
    f_scat = jax.jit(lambda b, kf: jnp.zeros((KK, 6), jnp.float32)
                     .at[kf].add(b))
    print(f"scatter-add [E,6]->[K,6]: {timeit(f_scat, b, kf):.3f} ms",
          flush=True)

    # segment_sum
    f_seg = jax.jit(lambda b, kf: jax.ops.segment_sum(b, kf, KK))
    print(f"segment_sum:              {timeit(f_seg, b, kf):.3f} ms",
          flush=True)

    # gather table [K, C]
    kf_np = np.asarray(kf)
    order = np.argsort(kf_np, kind="stable")
    counts = np.bincount(kf_np, minlength=K)
    C = int(counts.max())
    C = (C + 127) // 128 * 128
    idx = np.full((K, C), E, np.int32)
    off = 0
    for k in range(K):
        idx[k, :counts[k]] = order[off:off + counts[k]]
        off += counts[k]
    idx_j = jnp.asarray(idx)
    bpad = jnp.concatenate([b, jnp.zeros((1, 6), jnp.float32)])

    f_gat = jax.jit(lambda bpad, idx_j:
                    jnp.take(bpad, idx_j.reshape(-1), axis=0)
                    .reshape(K, C, 6).sum(1))
    print(f"gatherC (C={C}) rows:      {timeit(f_gat, bpad, idx_j):.3f} ms",
          flush=True)

    # gather on transposed layout [6, E]
    f_gat2 = jax.jit(lambda bT, idx_j:
                     jnp.take(bT, idx_j.reshape(-1), axis=1)
                     .reshape(6, K, C).sum(2))
    bTpad = jnp.concatenate([bT, jnp.zeros((6, 1), jnp.float32)], axis=1)
    print(f"gatherC [6,E] cols:        {timeit(f_gat2, bTpad, idx_j):.3f} ms",
          flush=True)

    # one-hot chunked matmul
    def onehot_reduce(bT, kf):
        n_chunks = 16
        ce = E // n_chunks
        kf_c = kf.reshape(n_chunks, ce)
        b_c = jnp.moveaxis(bT.reshape(6, n_chunks, ce), 1, 0)

        def body(acc, inp):
            kf_i, b_i = inp
            Of = jax.nn.one_hot(kf_i, KK, dtype=jnp.float32)
            return acc + jax.lax.dot_general(
                b_i, Of, (((1,), (0,)), ((), ()))), None

        acc, _ = jax.lax.scan(body, jnp.zeros((6, KK)), (kf_c, b_c))
        return acc

    f_oh = jax.jit(onehot_reduce)
    print(f"one-hot chunked matmul:   {timeit(f_oh, bT, kf):.3f} ms",
          flush=True)

    # sorted cumsum + boundary diff (b pre-sorted by kf)
    b_sorted = jnp.asarray(np.asarray(b)[order])
    starts = np.searchsorted(kf_np[order], np.arange(K + 1)).astype(np.int32)
    starts_j = jnp.asarray(starts)

    def cumsum_reduce(bs, starts_j):
        c = jnp.cumsum(bs, axis=0)
        c = jnp.concatenate([jnp.zeros((1, 6)), c])
        return c[starts_j[1:]] - c[starts_j[:-1]]

    f_cs = jax.jit(cumsum_reduce)
    print(f"cumsum+boundary:          {timeit(f_cs, b_sorted, starts_j):.3f} ms",
          flush=True)

    # sanity: all agree
    ref = np.zeros((K, 6))
    np.add.at(ref, kf_np, np.asarray(b))
    for name, val in [("scatter", f_scat(b, kf)[:K]),
                      ("segsum", f_seg(b, kf)[:K]),
                      ("gatherC", f_gat(bpad, idx_j)),
                      ("gatherC2", f_gat2(bTpad, idx_j).T),
                      ("onehot", f_oh(bT, kf)[:, :K].T),
                      ("cumsum", f_cs(b_sorted, starts_j))]:
        err = np.abs(np.asarray(val) - ref).max() / np.abs(ref).max()
        print(f"  {name}: rel err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
