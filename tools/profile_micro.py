"""Micro-benchmarks for the BA hot-path suspects on TPU."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

E = 524288
K = 256
KK = K + 1
M = 8
P = E // M

rng = np.random.default_rng(0)
kf_e = jnp.asarray(rng.integers(0, K, E), jnp.int32)
pose_t = jnp.asarray(rng.normal(size=(7, K)), jnp.float32)
pose_rows = pose_t.T  # [K, 7]
x = jnp.asarray(rng.normal(size=(E,)), jnp.float32)


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


f1 = jax.jit(lambda t, i: jnp.take(t, i, axis=1))  # lane-axis gather
print(f"take [7,K] axis=1 -> [7,E]:      {timeit(f1, pose_t, kf_e):.3f} ms")

f2 = jax.jit(lambda t, i: jnp.take(t, i, axis=0))  # row gather
print(f"take [K,7] axis=0 -> [E,7]:      {timeit(f2, pose_rows, kf_e):.3f} ms")

f2b = jax.jit(lambda t, i: jnp.take(t, i, axis=0).T)
print(f"take rows then transpose:        {timeit(f2b, pose_rows, kf_e):.3f} ms")


def gather_onehot(t, i):
    # [7, K] @ [K, E] one-hot
    oh = (i[None, :] == jnp.arange(K)[:, None]).astype(jnp.float32)
    return t @ oh


f3 = jax.jit(gather_onehot)
print(f"gather via one-hot matmul:       {timeit(f3, pose_t, kf_e):.3f} ms")

# gather with indices reshaped 2D (sublane-major)
f4 = jax.jit(lambda t, i: jnp.take(t, i.reshape(P, M), axis=1))
print(f"take axis=1 idx [P,M]:           {timeit(f4, pose_t, kf_e):.3f} ms")

# one_hot construction + small matmul (the scan's Hcc path), per full E
Ht = jnp.asarray(rng.normal(size=(36, E)), jnp.float32)


def onehot_mm(kf, Ht, chunk):
    n = E // chunk
    kf_c = kf.reshape(n, chunk)
    Ht_c = jnp.moveaxis(Ht.reshape(36, n, chunk), 1, 0)

    def body(acc, inp):
        kf_i, Ht_i = inp
        Of = jax.nn.one_hot(kf_i, KK, dtype=jnp.float32)
        return acc + jax.lax.dot_general(
            Ht_i, Of, (((1,), (0,)), ((), ()))), None

    out, _ = jax.lax.scan(body, jnp.zeros((36, KK)), (kf_c, Ht_c))
    return out


for chunk in (32768, 131072):
    f5 = jax.jit(lambda kf, h, c=chunk: onehot_mm(kf, h, c))
    print(f"one-hot matmul 36xE chunk={chunk}: {timeit(f5, kf_e, Ht):.3f} ms")

# pure elementwise: 30 outputs from 10 inputs over E
ins = [jnp.asarray(rng.normal(size=(E,)), jnp.float32) for _ in range(10)]


def elem(*a):
    outs = []
    for i in range(30):
        v = a[i % 10] * a[(i + 1) % 10] + a[(i + 2) % 10]
        outs.append(v)
    return jnp.stack(outs)


f6 = jax.jit(elem)
print(f"elementwise 30xE stack:          {timeit(f6, *ins):.3f} ms")

# repeat P->E along lanes
pw0 = jnp.asarray(rng.normal(size=(P,)), jnp.float32)
f7 = jax.jit(lambda p: jnp.repeat(p, M))
print(f"repeat [P] -> [E]:               {timeit(f7, pw0):.3f} ms")

# scan overhead: 16-step scan of trivial body over the same data
def scan_triv(Ht):
    Ht_c = jnp.moveaxis(Ht.reshape(36, 16, E // 16), 1, 0)

    def body(acc, h):
        return acc + jnp.sum(h, axis=1), None

    out, _ = jax.lax.scan(body, jnp.zeros((36,)), Ht_c)
    return out


f8 = jax.jit(scan_triv)
print(f"16-step scan trivial body:       {timeit(f8, Ht):.3f} ms")
