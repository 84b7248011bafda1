"""Floor test: kernel with the same I/O volume as prep_terms but trivial
compute — separates DMA cost from compute/op cost."""
import sys
import time
import functools

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, P = 8, 16384


def floor_kernel(g_ref, uvr_ref, o1, o2, o3, o4, o5, o6, o7, o8):
    g = g_ref[:]
    x = g[0] * 2.0
    o1[:] = jnp.stack([x] * 18)
    o2[:] = jnp.stack([x] * 18)
    o3[:] = jnp.stack([x] * 36)
    o4[:] = jnp.stack([x] * 6)
    o5[:] = jnp.stack([x] * 6)
    o6[:] = jnp.sum(g[:6], axis=1)
    o7[:] = jnp.sum(g[:3], axis=1)
    o8[:] = x


@functools.partial(jax.jit, static_argnames=("pb",))
def floor_call(g, uvr, pb):
    def im3(i):
        return (0, 0, i)

    def im2(i):
        return (0, i)

    return pl.pallas_call(
        floor_kernel,
        grid=(P // pb,),
        in_specs=[pl.BlockSpec((7, M, pb), im3, memory_space=pltpu.VMEM),
                  pl.BlockSpec((3, M, pb), im3, memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((18, M, pb), im3, memory_space=pltpu.VMEM),
                   pl.BlockSpec((18, M, pb), im3, memory_space=pltpu.VMEM),
                   pl.BlockSpec((36, M, pb), im3, memory_space=pltpu.VMEM),
                   pl.BlockSpec((6, M, pb), im3, memory_space=pltpu.VMEM),
                   pl.BlockSpec((6, M, pb), im3, memory_space=pltpu.VMEM),
                   pl.BlockSpec((6, pb), im2, memory_space=pltpu.VMEM),
                   pl.BlockSpec((3, pb), im2, memory_space=pltpu.VMEM),
                   pl.BlockSpec((M, pb), im2, memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((18, M, P), jnp.float32),
                   jax.ShapeDtypeStruct((18, M, P), jnp.float32),
                   jax.ShapeDtypeStruct((36, M, P), jnp.float32),
                   jax.ShapeDtypeStruct((6, M, P), jnp.float32),
                   jax.ShapeDtypeStruct((6, M, P), jnp.float32),
                   jax.ShapeDtypeStruct((6, P), jnp.float32),
                   jax.ShapeDtypeStruct((3, P), jnp.float32),
                   jax.ShapeDtypeStruct((M, P), jnp.float32)],
    )(g, uvr)


rng = np.random.default_rng(0)
g = jnp.asarray(rng.normal(size=(7, M, P)).astype(np.float32))
uvr = jnp.asarray(rng.normal(size=(3, M, P)).astype(np.float32))

for pb in (1024, 2048):
    try:
        @jax.jit
        def loop(g, uvr):
            def body(i, acc):
                out = floor_call(g + acc * 1e-30, uvr, pb)
                return acc + out[0][0, 0, 0] * 1e-30
            return jax.lax.fori_loop(0, 10, body, jnp.asarray(0.0))

        jax.block_until_ready(loop(g, uvr))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(loop(g, uvr))
            ts.append(time.perf_counter() - t0)
        print(f"pb={pb}: floor per-iter {min(ts) * 100:.2f} ms", flush=True)
    except Exception as e:
        print(f"pb={pb}: {type(e).__name__} {str(e)[:200]}", flush=True)
