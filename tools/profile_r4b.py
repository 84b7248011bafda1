"""Ablation profile of the one-hot assembly scan at bench scale.

Times in-jit 10x loops of ablated variants of the full-width chunk body to
attribute the ~19-21 ms/iter assembly marginal (profile_r4.py) to its parts:

  onehot   : one-hot build only
  diag     : + Hcc/bc/rhs one-hot matmuls ([36,ce]@[ce,KK])
  uv       : + U/V batched [cp,18,M]@[cp,M,KK] builds
  sprod    : + S = U2^T V2 (the full chunk body)

Run banded variants with KK -> R+1 = 65 to compare.
"""
import sys
import time

sys.path.insert(0, ".")
import functools

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_problem
from multiagent_orb_slam2_tpu.optim import ba

prob, cam = build_problem()
K = prob.q.shape[0]
P, M = prob.obs_kf.shape
E = P * M
chunk = 4096
KK = K + 1
n_chunks = P // chunk
cp = chunk
ce = cp * M
N = 10

rng = np.random.default_rng(0)
kf_e = jnp.asarray(np.asarray(prob.obs_kf).reshape(E), jnp.int32)
kf_c = jnp.clip(kf_e, 0, K).reshape(n_chunks, ce)
Y = jnp.asarray(rng.normal(size=(6, 3, E)).astype(np.float32))
Wb = jnp.asarray(rng.normal(size=(6, 3, E)).astype(np.float32))
Ht = jnp.asarray(rng.normal(size=(36, E)).astype(np.float32))
bt = jnp.asarray(rng.normal(size=(6, E)).astype(np.float32))
Yb = jnp.asarray(rng.normal(size=(6, E)).astype(np.float32))

Y_c = jnp.moveaxis(Y.reshape(6, 3, n_chunks, ce), 2, 0)
Ht_c = jnp.moveaxis(Ht.reshape(36, n_chunks, ce), 1, 0)
bt_c = jnp.moveaxis(bt.reshape(6, n_chunks, ce), 1, 0)
Yb_c = jnp.moveaxis(Yb.reshape(6, n_chunks, ce), 1, 0)
Wb_c = jnp.moveaxis(Wb.reshape(6, 3, n_chunks, ce), 2, 0)


@functools.partial(jax.jit, static_argnames=("mode", "width"))
def run(dummy, mode, width):
    W = width

    def chunk_body(carry, inp):
        S_acc, rhs_acc, Hcc_acc, bc_acc = carry
        kf_i, Y_i, Wb_i, Ht_i, bt_i, Ybp_i = inp
        kf_w = jnp.minimum(kf_i, W - 1)
        Of = jax.nn.one_hot(kf_w, W, dtype=jnp.float32)
        acc = jnp.sum(Of[:8, :8])
        if mode in ("diag", "uv", "sprod"):
            Hcc_acc = Hcc_acc + jax.lax.dot_general(
                Ht_i, Of, (((1,), (0,)), ((), ())))
            bc_acc = bc_acc + jax.lax.dot_general(
                bt_i, Of, (((1,), (0,)), ((), ())))
            rhs_acc = rhs_acc + jax.lax.dot_general(
                Ybp_i, Of, (((1,), (0,)), ((), ())))
        if mode in ("uv", "sprod"):
            O3 = Of.reshape(cp, M, W)
            Y3 = Y_i.reshape(6, 3, cp, M).transpose(2, 1, 0, 3).reshape(
                cp, 18, M)
            W3 = Wb_i.reshape(6, 3, cp, M).transpose(2, 1, 0, 3).reshape(
                cp, 18, M)
            U = jax.lax.dot_general(Y3, O3, (((2,), (1,)), ((0,), (0,))))
            V = jax.lax.dot_general(W3, O3, (((2,), (1,)), ((0,), (0,))))
            acc = acc + jnp.sum(U[:2, :2, :2]) + jnp.sum(V[:2, :2, :2])
            if mode == "sprod":
                U2 = U.reshape(cp * 3, 6 * W)
                V2 = V.reshape(cp * 3, 6 * W)
                S_acc = S_acc + jax.lax.dot_general(
                    U2, V2, (((0,), (0,)), ((), ())))
        rhs_acc = rhs_acc + acc * 1e-30
        return (S_acc, rhs_acc, Hcc_acc, bc_acc), None

    def body(i, tot):
        carry0 = (jnp.zeros((6 * W, 6 * W)), jnp.zeros((6, W)) + dummy + tot * 0,
                  jnp.zeros((36, W)), jnp.zeros((6, W)))
        (S_a, rhs_p, Hcc_f, bc_f), _ = jax.lax.scan(
            chunk_body, carry0, (kf_c, Y_c, Wb_c, Ht_c, bt_c, Yb_c))
        return tot + (jnp.sum(S_a[:2, :2]) + jnp.sum(rhs_p[:2, :2])
                      + jnp.sum(Hcc_f[:2, :2]) + jnp.sum(bc_f[:2, :2])) * 1e-30

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
    print(f"{label}: compile {c:5.1f}s  per-iter {ms:6.2f} ms")
    return ms


for W in (KK, 65):
    print(f"--- width {W} ---")
    for mode in ("onehot", "diag", "uv", "sprod"):
        clock(f"{mode:7s} W={W:3d}", functools.partial(run, jnp.asarray(0.0),
                                                       mode=mode, width=W))
