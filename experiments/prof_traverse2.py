"""Traversal primitive costs with dispatch overhead amortized: each op runs
K times inside one jitted fori_loop; report per-iteration time."""

import time

import jax
import jax.numpy as jnp

R = 1 << 20
N = 128
S = 32
K = 64


def timeit(name, body, init, reps=3):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, K, body, x)

    out = jax.block_until_ready(run(init))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(run(init))
    dt = (time.perf_counter() - t0) / reps / K
    print(f"{name:44s} {dt*1e3:9.4f} ms/iter -> "
          f"{R/dt/1e6:10.1f} Mray-steps/s")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (R,), 0, N, dtype=jnp.int32)
    table = jax.random.normal(key, (N, 8), dtype=jnp.float32)
    stack_n = jax.random.randint(key, (R,), 0, S, dtype=jnp.int32)
    lane = jnp.arange(S, dtype=jnp.int32)[None, :]

    def g_row(i, x):
        t = table[(idx + i) % N]
        return x + t.sum(-1)
    timeit("row gather (128, 8)", g_row, jnp.zeros(R))

    def g_oh(i, x):
        oh = jax.nn.one_hot((idx + i) % N, N, dtype=jnp.float32)
        return x + (oh @ table).sum(-1)
    timeit("one-hot matmul gather (128, 8)", g_oh, jnp.zeros(R))

    big = jax.random.normal(key, (1 << 14, 8), dtype=jnp.float32)
    bidx = jax.random.randint(key, (R,), 0, 1 << 14, dtype=jnp.int32)

    def g_big(i, x):
        return x + big[(bidx + i) % (1 << 14)].sum(-1)
    timeit("row gather (16384, 8)", g_big, jnp.zeros(R))

    def push(i, st):
        write = lane == ((stack_n + i) % S)[:, None]
        return jnp.where(write, i, st)
    timeit("stack push (R, 32) where", push, jnp.zeros((R, S), jnp.int32))

    def pop(i, x):
        st = x[1]
        v = jnp.take_along_axis(st, ((stack_n + i) % S)[:, None], 1)[:, 0]
        return (x[0] + v, st)
    timeit("stack pop take_along_axis", pop,
           (jnp.zeros(R, jnp.int32), jnp.zeros((R, S), jnp.int32)))

    def elem(i, x):
        for _ in range(10):
            x = jnp.minimum(x * 1.7 + 0.3, x + 1.0)
        return x
    timeit("10x elementwise (R, 3)", elem, jnp.zeros((R, 3)))

    v0 = jax.random.normal(key, (N, 3))
    d0 = jax.random.normal(key, (R, 3))

    def brute(i, x):
        pvec = jnp.cross(d0[:, None, :] + i, v0[None, :, :])
        det = jnp.sum((v0 * 1.1) * pvec, -1)
        return x + det.min(-1)
    timeit("brute cross R x 128", brute, jnp.zeros(R), reps=2)


if __name__ == "__main__":
    main()
