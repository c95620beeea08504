"""Probe: PrefetchScalarGridSpec work-list kernel viability on TPU.

Checks (1) how large a scalar-prefetch item array SMEM tolerates,
(2) data-driven index maps fetching (64, 12) cluster slabs + (3, 1024)
ray blocks with accumulation into a revisited output block, and
(4) per-item step cost for a Moeller-sized vector body.
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
I32 = jnp.int32
RB = 1024
CS = 64


def kernel(items_ref, tab_ref, o_ref, out_ref):
    i = pl.program_id(0)
    item = items_ref[i]
    valid = (item & 1) == 1
    first = (item & 2) != 0

    @pl.when(valid)
    def _():
        tv = tab_ref[:, 0:1]                       # (CS, 1)
        o = o_ref[0:1, :]                          # (1, RB)
        x = tv * o                                 # (CS, RB)
        for c in range(1, 12):
            x = x + tab_ref[:, c:c + 1] * o
        red = jnp.min(x, axis=0, keepdims=True)    # (1, RB)
        prev = jnp.where(first, jnp.full((1, RB), 3e38, F32),
                         out_ref[0:1, :])
        out_ref[0:1, :] = jnp.minimum(prev, red)


@functools.partial(jax.jit, static_argnames=("capacity", "n_blocks"))
def run(items, tab, o, capacity, n_blocks):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(capacity,),
        in_specs=[
            pl.BlockSpec((CS, 12),
                         lambda i, it: ((it[i] >> 2) & 0xFFFF, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RB), lambda i, it: (0, it[i] >> 18),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, RB), lambda i, it: (0, it[i] >> 18),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, n_blocks * RB), F32),
    )(items, tab, o)


def main():
    n_clusters = 4096
    n_blocks = 64
    tab = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(0), (n_clusters * CS, 12)),
        F32)
    o = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (3, n_blocks * RB)), F32)

    for capacity in (1024, 16384, 65536, 262144):
        # items: each block visits capacity//n_blocks clusters, sorted
        per = capacity // n_blocks
        blk = jnp.repeat(jnp.arange(n_blocks, dtype=I32), per)
        cl = jnp.tile(jnp.arange(per, dtype=I32) % n_clusters, n_blocks)
        first = jnp.concatenate(
            [jnp.ones(1, I32),
             (blk[1:] != blk[:-1]).astype(I32)])
        items = (blk << 18) | (cl << 2) | (first << 1) | 1
        try:
            t0 = time.perf_counter()
            out = jax.block_until_ready(run(items, tab, o, capacity,
                                            n_blocks))
            compile_s = time.perf_counter() - t0
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                out = jax.block_until_ready(run(items, tab, o, capacity,
                                                n_blocks))
            dt = (time.perf_counter() - t0) / reps
            print(f"capacity={capacity}: OK compile={compile_s:.1f}s "
                  f"run={dt*1e3:.2f}ms per_item={dt/capacity*1e9:.0f}ns "
                  f"sum={float(out.sum()):.3g}")
        except Exception as e:
            print(f"capacity={capacity}: FAIL {type(e).__name__}: "
                  f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
