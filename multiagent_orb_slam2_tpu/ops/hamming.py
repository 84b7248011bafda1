"""Packed 256-bit binary descriptor Hamming distance, the universal matching
primitive.

Replaces ORBmatcher::DescriptorDistance (reference src/ORBmatcher.cc:1649, the
POPCNT bit-hack) and every brute-force loop built on it. Descriptors are packed
as [*, 8] uint32 (256 bits). Distance matrices D[i, j] = popcount(a_i ^ b_j)
are computed as XOR + vectorized popcount with masked reductions; on TPU the
popcount runs on the VPU over lane-aligned tiles.

An alternative MXU formulation (used for very large all-pairs scoring, e.g.
BoW database queries): with descriptors unpacked to {-1,+1} int8 vectors d of
length 256, popcount(a^b) = (256 - a.b)/2 — a pure int8 matmul on the MXU.
`unpack_pm1` + a jnp.dot gives that path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

WORDS = 8          # 8 x uint32 = 256 bits
BITS = 256


def popcount_u32(x):
    """Vectorized 32-bit popcount (Hacker's Delight bit-twiddling)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def hamming(a, b):
    """Elementwise distance between packed descriptors a, b [..., 8] uint32."""
    return jnp.sum(popcount_u32(jnp.bitwise_xor(a, b)), axis=-1)


def hamming_matrix(a, b):
    """All-pairs distance matrix: a [N, 8], b [M, 8] -> [N, M] int32."""
    return jnp.sum(
        popcount_u32(jnp.bitwise_xor(a[:, None, :], b[None, :, :])), axis=-1
    )


def hamming_matrix_chunked(a, b, chunk: int = 512):
    """Memory-bounded all-pairs distance for large N*M (scan over b-chunks)."""
    n, m = a.shape[0], b.shape[0]
    pad = (-m) % chunk
    bp = jnp.pad(b, ((0, pad), (0, 0)))
    bc = bp.reshape(-1, chunk, WORDS)

    def body(carry, b_blk):
        return carry, hamming_matrix(a, b_blk)

    _, out = jax.lax.scan(body, None, bc)
    return jnp.moveaxis(out, 0, 1).reshape(n, -1)[:, :m]


def unpack_bits(packed):
    """[..., 8] uint32 -> [..., 256] {0,1} int8 (bit i of word w -> col w*32+i)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[..., :, None] >> shifts) & jnp.uint32(1)
    return bits.reshape(packed.shape[:-1] + (BITS,)).astype(jnp.int8)


def unpack_pm1(packed):
    """[..., 8] uint32 -> [..., 256] {-1,+1} int8 for MXU dot-product distance."""
    return (unpack_bits(packed) * 2 - 1).astype(jnp.int8)


def hamming_matrix_mxu(a, b):
    """All-pairs distance via the MXU: popcount(a^b) = (256 - <±1 vecs>)/2.

    Preferred on TPU when N*M is large (BoW scoring, covisibility discovery):
    one int8/bf16 matmul instead of N*M*8 VPU popcounts.
    """
    av = unpack_pm1(a).astype(jnp.bfloat16)
    bv = unpack_pm1(b).astype(jnp.bfloat16)
    dot = jax.lax.dot_general(
        av, bv, (((av.ndim - 1,), (bv.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return ((BITS - dot) * 0.5).astype(jnp.int32)


def pack_bits(bits):
    """[..., 256] {0,1} -> [..., 8] uint32."""
    b = bits.reshape(bits.shape[:-1] + (WORDS, 32)).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)


def masked_argmin(dist, mask, big: int = 10_000):
    """argmin over axis -1 with invalid entries masked out.

    Returns (best_idx, best_val, second_val) — the triple every ratio-test
    matcher in the reference needs (e.g. SearchByBoW's bestDist/bestDist2,
    src/ORBmatcher.cc:197-240).
    """
    d = jnp.where(mask, dist, big)
    best_idx = jnp.argmin(d, axis=-1)
    best = jnp.take_along_axis(d, best_idx[..., None], axis=-1)[..., 0]
    d2 = jnp.where(
        jax.nn.one_hot(best_idx, d.shape[-1], dtype=bool), big, d)
    second = jnp.min(d2, axis=-1)
    return best_idx, best, second
