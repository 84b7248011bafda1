"""Closure-captured big arrays vs explicit jit args on the axon TPU."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

E = 524288
rng = np.random.default_rng(0)
big = jnp.asarray(rng.normal(size=(E,)), jnp.float32)
big2 = jnp.asarray(rng.normal(size=(E,)), jnp.float32)
x = jnp.asarray(1.5, jnp.float32)


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


f_closure = jax.jit(lambda x: jnp.sum(big * x + big2))
print(f"closure-captured [E] arrays: {timeit(f_closure, x):.3f} ms")

f_args = jax.jit(lambda x, a, b: jnp.sum(a * x + b))
print(f"explicit-arg [E] arrays:     {timeit(f_args, x, big, big2):.3f} ms")

print("big device:", big.devices())
