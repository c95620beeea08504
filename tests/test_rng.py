"""RNG bit-exactness tests.

The JAX implementation is validated against independent pure-Python integer
models of xoshiro128**, SplitMix64 and Morton interleave, written directly
from the published algorithms. Bit-exact per-pixel streams are the
foundation of the megakernel/wavefront mutual-oracle tests.
"""

import numpy as np
import jax.numpy as jnp

from directcomputeraytracing_tpu.rng.xoshiro import (
    init_rng,
    morton_interleave_32,
    next_sample_1d,
    splitmix64_next,
    xoshiro_next,
)

M32 = 0xFFFFFFFF
M64 = 0xFFFFFFFFFFFFFFFF


def py_rotl32(x, k):
    return ((x << k) | (x >> (32 - k))) & M32


def py_xoshiro_next(s):
    """Reference python model of xoshiro128** (Blackman & Vigna)."""
    result = (py_rotl32((s[0] * 5) & M32, 7) * 9) & M32
    t = (s[1] << 9) & M32
    s[2] ^= s[0]
    s[3] ^= s[1]
    s[1] ^= s[2]
    s[0] ^= s[3]
    s[2] ^= t
    s[3] = py_rotl32(s[3], 11)
    return result


def py_splitmix64(state):
    state = (state + 0x9E3779B97F4A7C15) & M64
    z = state
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return state, z ^ (z >> 31)


def py_morton(x, y):
    out = 0
    for i in range(16):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_xoshiro_bit_exact():
    seeds = [
        [1, 2, 3, 4],
        [0xDEADBEEF, 0x12345678, 0xCAFEBABE, 0x87654321],
        [1, 0, 0, 0],
    ]
    state = jnp.asarray(seeds, dtype=jnp.uint32)
    py_states = [list(s) for s in seeds]
    for _ in range(64):
        state, got = xoshiro_next(state)
        want = [py_xoshiro_next(s) for s in py_states]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want, np.uint32))
    np.testing.assert_array_equal(
        np.asarray(state), np.asarray(py_states, np.uint32)
    )


def test_splitmix64_bit_exact():
    for seed in [0, 1, 0x123456789ABCDEF0, 0xFFFFFFFFFFFFFFFF]:
        lo = jnp.asarray([seed & M32], jnp.uint32)
        hi = jnp.asarray([(seed >> 32) & M32], jnp.uint32)
        st = (lo, hi)
        py = seed
        for _ in range(8):
            st, out = splitmix64_next(st)
            py, py_out = py_splitmix64(py)
            got = int(np.asarray(out[0])[0]) | (int(np.asarray(out[1])[0]) << 32)
            assert got == py_out, hex(seed)


def test_morton_interleave():
    xs = np.asarray([0, 1, 2, 3, 0xFFFF, 12345], np.uint32)
    ys = np.asarray([0, 1, 3, 2, 0xFFFF, 54321], np.uint32)
    got = np.asarray(morton_interleave_32(jnp.asarray(xs), jnp.asarray(ys)))
    want = np.asarray([py_morton(int(x), int(y)) for x, y in zip(xs, ys)], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_init_rng_matches_python_model():
    """Seeding: SplitMix64(morton(px,py) | frameSeed<<32) -> 2 outputs -> state."""
    px, py_, frame = 37, 113, 9
    st = init_rng(jnp.uint32(px), jnp.uint32(py_), jnp.uint32(frame))
    seed64 = py_morton(px, py_) | (frame << 32)
    s, o0 = py_splitmix64(seed64)
    s, o1 = py_splitmix64(s)
    want = np.asarray(
        [o0 & M32, (o0 >> 32) & M32, o1 & M32, (o1 >> 32) & M32], np.uint32
    )
    np.testing.assert_array_equal(np.asarray(st), want)


def test_samples_in_unit_interval_and_reproducible():
    xs = jnp.arange(0, 64, dtype=jnp.uint32)
    ys = jnp.arange(64, 128, dtype=jnp.uint32)
    state = init_rng(xs, ys, jnp.uint32(7))
    vals = []
    for _ in range(16):
        state, u = next_sample_1d(state)
        vals.append(np.asarray(u))
    vals = np.stack(vals)
    assert vals.min() >= 0.0 and vals.max() < 1.0
    # distinct pixels get distinct streams
    assert len(np.unique(vals[:, :8].round(7), axis=1)) == vals.shape[0]
    # reproducible
    state2 = init_rng(xs, ys, jnp.uint32(7))
    _, u2 = next_sample_1d(state2)
    np.testing.assert_array_equal(vals[0], np.asarray(u2))
