"""Cost of a 1M-row gather from the cluster table on TPU.

If one (R,) -> (R,13) table gather is cheap (<2 ms amortized), the
sweep kernels can stop selecting 6 winner attributes per iteration
(6 cross-sublane reduce chains) and instead emit ONE packed winner row
id, with tri/inst/flip read and t/u/v/back re-derived post-kernel.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32
R = 1 << 20
N = 212_000 // 16 * 16      # cluster rows at the 212k-tri scale

rng = np.random.default_rng(0)
table = jnp.asarray(rng.normal(size=(N, 13)).astype(np.float32))
# block-local winners: rays of a block hit nearby rows (realistic)
base = rng.integers(0, N - 64, size=(R // 1024,))
idx = (base[:, None] + rng.integers(0, 64, size=(R // 1024, 1024)))
idx = jnp.asarray(idx.reshape(-1).astype(np.int32))
K = 8


def bench(fn, *args, reps=5):
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def amort(body):
    def run(idx):
        def it(i, acc):
            out = body(jnp.clip(idx + i, 0, N - 1))
            return acc + jnp.sum(out[::257])
        return jax.lax.fori_loop(0, K, it, jnp.float32(0))
    return jax.jit(run)


@jax.jit
def grow(idx):
    return table[idx].sum(axis=1)       # full 13-col row gather


@jax.jit
def gcol(idx):
    return table[idx, 9]                # one column


for name, fn in (("row13", grow), ("col1", gcol)):
    t = bench(amort(fn), idx) / K
    print(f"{name:>6}: {t*1e3:6.2f} ms per 1M gathers")
