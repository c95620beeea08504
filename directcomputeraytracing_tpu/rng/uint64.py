"""64-bit unsigned integer arithmetic emulated on pairs of uint32 arrays.

JAX on TPU has no native uint64, so — exactly like the reference emulates
uint64 on `uint2` for its SplitMix64 seeder (reference:
Shaders/UInt64.inc.hlsl:4-46) — we carry (lo, hi) uint32 pairs. All ops are
fully vectorized over leading array dimensions and wrap modulo 2^64.
"""

import jax.numpy as jnp

U32 = jnp.uint32


def u64(lo, hi):
    """Build a (lo, hi) pair from ints or arrays."""
    return jnp.asarray(lo, U32), jnp.asarray(hi, U32)


def u64_add(a, b):
    alo, ahi = a
    blo, bhi = b
    lo = alo + blo
    carry = (lo < alo).astype(U32)
    hi = ahi + bhi + carry
    return lo, hi


def u64_xor(a, b):
    return a[0] ^ b[0], a[1] ^ b[1]


def u64_shift_right(a, n):
    """Logical right shift by a static 0 < n < 32."""
    lo, hi = a
    n = int(n)
    assert 0 < n < 32
    return (lo >> n) | (hi << (32 - n)), hi >> n


def u64_shift_left(a, n):
    lo, hi = a
    n = int(n)
    assert 0 < n < 32
    return lo << n, (hi << n) | (lo >> (32 - n))


def u32_mul_to_u64(a, b):
    """Full 32x32 -> 64 bit multiply of uint32 arrays."""
    a = jnp.asarray(a, U32)
    b = jnp.asarray(b, U32)
    a0 = a & U32(0xFFFF)
    a1 = a >> 16
    b0 = b & U32(0xFFFF)
    b1 = b >> 16
    p11 = a1 * b1
    p01 = a0 * b1
    p10 = a1 * b0
    p00 = a0 * b0
    middle = p10 + (p00 >> 16) + (p01 & U32(0xFFFF))
    hi = p11 + (middle >> 16) + (p01 >> 16)
    lo = (middle << 16) | (p00 & U32(0xFFFF))
    return lo, hi


def u64_mul(a, b):
    """64x64 -> low 64 bits of the product."""
    alo, ahi = a
    blo, bhi = b
    lo, hi = u32_mul_to_u64(alo, blo)
    hi = hi + ahi * blo + alo * bhi
    return lo, hi
