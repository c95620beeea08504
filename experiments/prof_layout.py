"""Pin down TPU layout/traffic costs for narrow vs wide arrays.

Times amortized elementwise copies of equal LOGICAL size (32 MB) in
different shapes, the isolated (R,9)->(9,R) transpose, and the ray-prep
concat — to find where the 7.7 ms/1M-ray prep cost actually lives.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32
R = 1 << 20
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


def amort(body, probe):
    def run(x):
        def it(i, acc):
            out = body(x + jnp.float32(i))
            return acc + probe(out)
        return jax.lax.fori_loop(0, K, it, jnp.float32(0))
    return jax.jit(run)


rng = np.random.default_rng(0)
flat = jnp.asarray(rng.normal(size=(8 * R,)).astype(np.float32))

shapes = [("(8R,)  flat", (8 * R,)),
          ("(R,8)      ", (R, 8)),
          ("(R/16,128) ", (R // 16, 128)),
          ("(R,3)->same", (R, 3)),
          ("(3,R)      ", (3, R))]
for name, shp in shapes:
    n = int(np.prod(shp))
    x = flat[:n].reshape(shp)
    t = bench(amort(lambda v: v * 1.0000001,
                    lambda o: jnp.sum(o.ravel()[::769])), x) / K
    gbs = 2 * n * 4 / t / 1e9
    print(f"copy {name}: {t*1e3:6.2f} ms  ({gbs:6.0f} GB/s logical)")

# isolated transpose of a PRE-materialized (R,9)
base9 = jnp.asarray(rng.normal(size=(R, 9)).astype(np.float32))
t = bench(amort(lambda v: v.T, lambda o: jnp.sum(o[:, ::769])), base9) / K
print(f"T (R,9)->(9,R) isolated: {t*1e3:6.2f} ms")
base9t = jnp.asarray(rng.normal(size=(9, R)).astype(np.float32))
t = bench(amort(lambda v: v * 1.0000001,
                lambda o: jnp.sum(o[:, ::769])), base9t) / K
print(f"copy (9,R): {t*1e3:6.2f} ms")

# the actual prep concat from (R,3) components
o3 = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
d3 = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))


def prep_now(o):
    d = d3
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
    return jnp.concatenate([o, d, inv], axis=1).T


t = bench(amort(prep_now, lambda o: jnp.sum(o[:, ::769])), o3) / K
print(f"prep concat+T from (R,3): {t*1e3:6.2f} ms")


def prep_flat(o):
    d = d3
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
    # dense route: flatten components first, stack rows on a wide array
    ot, dt, it_ = o.T, d.T, inv.T          # (3, R) each
    return jnp.concatenate([ot, dt, it_], axis=0)


t = bench(amort(prep_flat, lambda o: jnp.sum(o[:, ::769])), o3) / K
print(f"prep 3x(3,R) concat     : {t*1e3:6.2f} ms")
