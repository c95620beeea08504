"""Microbenchmarks for TPU traversal primitives: where does the time go?

Compares the cost of the building blocks used by the while-loop traversal:
row gathers from small tables, one-hot matmul gathers, per-row stack
updates, take_along_axis — at the ray counts bench.py uses.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

R = 1 << 20
N = 128          # node-table rows
S = 32           # stack depth


def timeit(name, fn, *args, reps=10):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(jax.jit(fn)(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:9.3f} ms")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (R,), 0, N, dtype=jnp.int32)
    table = jax.random.normal(key, (N, 8), dtype=jnp.float32)
    big_table = jax.random.normal(key, (1 << 14, 8), dtype=jnp.float32)
    big_idx = jax.random.randint(key, (R,), 0, 1 << 14, dtype=jnp.int32)
    stack = jnp.zeros((R, S), jnp.uint32)
    stack_n = jax.random.randint(key, (R,), 0, S, dtype=jnp.int32)
    vals = jax.random.randint(key, (R,), 0, 1 << 30).astype(jnp.uint32)
    lane = jnp.arange(S, dtype=jnp.int32)[None, :]

    timeit("row gather (128, 8)", lambda i: table[i].sum(), idx)
    timeit("row gather (16384, 8)", lambda i: big_table[i].sum(), big_idx)

    def onehot_gather(i):
        oh = jax.nn.one_hot(i, N, dtype=jnp.bfloat16)
        return (oh @ table.astype(jnp.bfloat16)).sum()
    timeit("one-hot matmul gather (128, 8)", onehot_gather, idx)

    def onehot_gather_f32(i):
        oh = jax.nn.one_hot(i, N, dtype=jnp.float32)
        return (oh @ table).sum()
    timeit("one-hot f32 matmul gather (128, 8)", onehot_gather_f32, idx)

    def stack_push(st, n, v):
        write = lane == n[:, None]
        return jnp.where(write, v[:, None], st).sum()
    timeit("stack push (R, 32) where", stack_push, stack, stack_n, vals)

    def stack_pop(st, n):
        return jnp.take_along_axis(st, n[:, None], axis=1).sum()
    timeit("stack pop take_along_axis", stack_pop, stack, stack_n)

    def stack_pop_onehot(st, n):
        oh = jax.nn.one_hot(n, S, dtype=st.dtype)
        return (st * oh).sum()
    timeit("stack pop one-hot reduce", stack_pop_onehot, stack, stack_n)

    # elementwise baseline: the arithmetic of ~10 AABB slab tests
    o = jax.random.normal(key, (R, 3))
    def slabs(o):
        acc = o
        for _ in range(10):
            acc = jnp.minimum(acc * 1.7 + 0.3, acc)
        return acc.sum()
    timeit("10x elementwise (R, 3)", slabs, o)

    # full brute-force triangle intersection: R x T tests via broadcasting
    T = 128
    v0 = jax.random.normal(key, (T, 3))
    d = jax.random.normal(key, (R, 3))
    def brute(o, d):
        # emulate the FLOP pattern of Moeller-Trumbore against all T tris
        e1 = v0 * 1.1
        e2 = v0 * 0.9
        pvec = jnp.cross(d[:, None, :], e2[None, :, :])     # (R, T, 3)
        det = jnp.sum(e1 * pvec, -1)
        return det.min(-1).sum()
    dt = timeit("brute cross+dot R x 128 tris", brute, o, d, reps=3)
    print(f"  -> {R / dt / 1e6:.1f} M primary 'rays'/s at 128 tris")


if __name__ == "__main__":
    main()
