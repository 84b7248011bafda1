"""Bisect the banded chunk body: which op eats the time?

Modes build successively larger prefixes of the banded scan body at bench
scale (K=256, P=64k, M=8, chunk=4096, R=128, NB=3):

  onehot : rel + masked one-hot [ce, R]
  diag   : + 3 small matmuls [36/6/6, ce] @ [ce, R] (no scatter)
  atadd  : + .at[bid].add of the 3 small results into [NB, ., R]
  uv     : + Y3/W3 transposes + batched U/V matmuls (no scatter)
  sprod  : + S_l = U2^T V2  [6R, 6R] (no scatter)
  satadd : + S_b.at[bid].add(S_l)
Each with f32; sprod/satadd also with bf16.
"""
import sys
import time

sys.path.insert(0, ".")
import functools

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_problem

prob, cam = build_problem()
K = prob.q.shape[0]
P, M = prob.obs_kf.shape
E = P * M
chunk = 4096
KK = K + 1
n_chunks = P // chunk
cp = chunk
ce = cp * M
R = 128
snap = 64
NB = max(K - R, 0) // snap + 1
N = 10

rng = np.random.default_rng(0)
kf_e = jnp.asarray(np.sort(np.asarray(prob.obs_kf), axis=0).reshape(E),
                   jnp.int32)
kf_c = jnp.clip(kf_e, 0, K).reshape(n_chunks, ce)
Y = jnp.asarray(rng.normal(size=(6, 3, E)).astype(np.float32))
Wb = jnp.asarray(rng.normal(size=(6, 3, E)).astype(np.float32))
Ht = jnp.asarray(rng.normal(size=(36, E)).astype(np.float32))
bt = jnp.asarray(rng.normal(size=(6, E)).astype(np.float32))
Yb = jnp.asarray(rng.normal(size=(6, E)).astype(np.float32))
base_c = jnp.asarray((np.arange(n_chunks) * K // n_chunks // snap * snap
                      ).clip(0, K - R).astype(np.int32))
bid_c = base_c // snap
inb_c = jnp.ones((n_chunks, cp), bool)

Y_c = jnp.moveaxis(Y.reshape(6, 3, n_chunks, ce), 2, 0)
Ht_c = jnp.moveaxis(Ht.reshape(36, n_chunks, ce), 1, 0)
bt_c = jnp.moveaxis(bt.reshape(6, n_chunks, ce), 1, 0)
Yb_c = jnp.moveaxis(Yb.reshape(6, n_chunks, ce), 1, 0)
Wb_c = jnp.moveaxis(Wb.reshape(6, 3, n_chunks, ce), 2, 0)

ORDER = ["onehot", "diag", "atadd", "uv", "sprod", "satadd"]


@functools.partial(jax.jit, static_argnames=("mode", "bf16"))
def run(dummy, mode, bf16):
    lvl = ORDER.index(mode)
    dt = jnp.bfloat16 if bf16 else jnp.float32

    def chunk_body(carry, inp):
        S_b, rhs_b, Hcc_b, bc_b = carry
        kf_i, Y_i, Wb_i, Ht_i, bt_i, Ybp_i, base_i, bid_i, inb_i = inp
        okp = jnp.repeat(inb_i, M) & (kf_i < K)
        rel = jnp.clip(kf_i - base_i, 0, R - 1)
        Of = jax.nn.one_hot(rel, R, dtype=jnp.float32) \
            * okp[:, None].astype(jnp.float32)
        acc = jnp.sum(Of[:8, :8])
        if lvl >= 1:
            h = jax.lax.dot_general(Ht_i, Of, (((1,), (0,)), ((), ())))
            b = jax.lax.dot_general(bt_i, Of, (((1,), (0,)), ((), ())))
            r = jax.lax.dot_general(Ybp_i, Of, (((1,), (0,)), ((), ())))
            if lvl >= 2:
                Hcc_b = Hcc_b.at[bid_i].add(h)
                bc_b = bc_b.at[bid_i].add(b)
                rhs_b = rhs_b.at[bid_i].add(r)
            else:
                acc = acc + jnp.sum(h[:2, :2]) + jnp.sum(b[:2, :2]) \
                    + jnp.sum(r[:2, :2])
        if lvl >= 3:
            O3 = Of.astype(dt).reshape(cp, M, R)
            Y3 = Y_i.reshape(6, 3, cp, M).transpose(2, 1, 0, 3).reshape(
                cp, 18, M).astype(dt)
            W3 = Wb_i.reshape(6, 3, cp, M).transpose(2, 1, 0, 3).reshape(
                cp, 18, M).astype(dt)
            U = jax.lax.dot_general(Y3, O3, (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            V = jax.lax.dot_general(W3, O3, (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            acc = acc + jnp.sum(U[:2, :2, :2]) + jnp.sum(V[:2, :2, :2])
            if lvl >= 4:
                U2 = U.reshape(cp * 3, 6 * R).astype(dt)
                V2 = V.reshape(cp * 3, 6 * R).astype(dt)
                S_l = jax.lax.dot_general(
                    U2, V2, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if lvl >= 5:
                    S_b = S_b.at[bid_i].add(S_l)
                else:
                    acc = acc + jnp.sum(S_l[:2, :2])
        rhs_b = rhs_b + acc * 1e-30
        return (S_b, rhs_b, Hcc_b, bc_b), None

    def body(i, tot):
        carry0 = (jnp.zeros((NB, 6 * R, 6 * R)),
                  jnp.zeros((NB, 6, R)) + dummy + tot * 0,
                  jnp.zeros((NB, 36, R)), jnp.zeros((NB, 6, R)))
        (S_b, rhs_b, Hcc_b, bc_b), _ = jax.lax.scan(
            chunk_body, carry0,
            (kf_c, Y_c, Wb_c, Ht_c, bt_c, Yb_c, base_c, bid_c, inb_c))
        return tot + (jnp.sum(S_b[:, :2, :2]) + jnp.sum(rhs_b[:, :2, :2])
                      + jnp.sum(Hcc_b[:, :2, :2])
                      + jnp.sum(bc_b[:, :2, :2])) * 1e-30

    return jax.lax.fori_loop(0, N, body, jnp.asarray(0.0))


def clock(label, fn):
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    c = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3 / N
    print(f"{label}: compile {c:5.1f}s  per-iter {ms:6.2f} ms", flush=True)
    return ms


for mode in ORDER:
    clock(f"{mode:7s} f32 ", functools.partial(run, jnp.asarray(0.0),
                                               mode=mode, bf16=False))
for mode in ("sprod", "satadd"):
    clock(f"{mode:7s} bf16", functools.partial(run, jnp.asarray(0.0),
                                               mode=mode, bf16=True))
