"""Counter-style vectorized xoshiro128** PRNG with SplitMix64 seeding.

Bit-exact re-implementation of the reference's per-path RNG
(reference: Shaders/Xoshiro.inc.hlsl, Shaders/Samples.inc.hlsl:34-70):
per-pixel seed = SplitMix64(Morton-interleaved pixel position, frame seed),
stream = xoshiro128**, float samples from the top 24 bits. Bit-exactness
matters because the megakernel and wavefront integrators must produce
*identical* per-pixel sample sequences so they can act as mutual
correctness oracles (the reference's own de-facto test strategy).

State is a uint32 array of shape (..., 4); every op is vectorized over the
leading dims so one call advances the RNG of an entire ray batch.
"""

import jax.numpy as jnp

from .uint64 import u64, u64_add, u64_mul, u64_shift_right

U32 = jnp.uint32


def _rotl(x, k):
    k = int(k)
    return (x << k) | (x >> (32 - k))


def xoshiro_next(state):
    """Advance xoshiro128**; returns (new_state (...,4) u32, result (...) u32)."""
    s0 = state[..., 0]
    s1 = state[..., 1]
    s2 = state[..., 2]
    s3 = state[..., 3]
    result = _rotl(s0 * U32(5), 7) * U32(9)
    t = s1 << 9
    s2 = s2 ^ s0
    s3 = s3 ^ s1
    s1 = s1 ^ s2
    s0 = s0 ^ s3
    s2 = s2 ^ t
    s3 = _rotl(s3, 11)
    return jnp.stack([s0, s1, s2, s3], axis=-1), result


def morton_interleave_32(x, y):
    """Interleave low 16 bits of x (even bits) and y (odd bits) into a uint32.

    Reference: Shaders/Samples.inc.hlsl:34-57 (Interleave_32bit).
    """
    x = jnp.asarray(x, U32) & U32(0x0000FFFF)
    y = jnp.asarray(y, U32) & U32(0x0000FFFF)

    def spread(v):
        v = (v | (v << 8)) & U32(0x00FF00FF)
        v = (v | (v << 4)) & U32(0x0F0F0F0F)
        v = (v | (v << 2)) & U32(0x33333333)
        v = (v | (v << 1)) & U32(0x55555555)
        return v

    return spread(x) | (spread(y) << 1)


def splitmix64_next(state):
    """One SplitMix64 step on a (lo, hi) uint32 pair. Returns (new_state, output).

    Reference: Shaders/Samples.inc.hlsl:61-70 (SplitMix64_NextRandom).
    """
    state = u64_add(state, u64(U32(0x7F4A7C15), U32(0x9E3779B9)))
    z = state
    z = u64_mul((z[0] ^ u64_shift_right(z, 30)[0], z[1] ^ u64_shift_right(z, 30)[1]),
                u64(U32(0x1CE4E5B9), U32(0xBF58476D)))
    z = u64_mul((z[0] ^ u64_shift_right(z, 27)[0], z[1] ^ u64_shift_right(z, 27)[1]),
                u64(U32(0x133111EB), U32(0x94D049BB)))
    out = (z[0] ^ u64_shift_right(z, 31)[0], z[1] ^ u64_shift_right(z, 31)[1])
    return state, out


def init_rng(pixel_x, pixel_y, frame_seed):
    """Per-pixel xoshiro128** state from (pixel position, frame seed).

    Reference: Shaders/Samples.inc.hlsl:72-85 (InitializeRandomNumberGenerator).
    `pixel_x`/`pixel_y` are integer arrays of any matching shape; `frame_seed`
    is a scalar (or broadcastable) uint32. Returns state shape (..., 4) u32.
    """
    lo = morton_interleave_32(pixel_x, pixel_y)
    hi = jnp.broadcast_to(jnp.asarray(frame_seed, U32), lo.shape)
    sm = (lo, hi)
    sm, s0 = splitmix64_next(sm)
    sm, s1 = splitmix64_next(sm)
    return jnp.stack([s0[0], s0[1], s1[0], s1[1]], axis=-1)


def next_sample_1d(state):
    """(new_state, u in [0,1) float32) — top 24 bits / 2^24.

    Reference: Shaders/Samples.inc.hlsl:4-10 (GetNextSample1D).
    """
    state, bits = xoshiro_next(state)
    u = (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
    return state, u


def next_sample_2d(state):
    state, ux = next_sample_1d(state)
    state, uy = next_sample_1d(state)
    return state, jnp.stack([ux, uy], axis=-1)


def next_sample_3d(state):
    state, uxy = next_sample_2d(state)
    state, uz = next_sample_1d(state)
    return state, jnp.concatenate([uxy, uz[..., None]], axis=-1)
