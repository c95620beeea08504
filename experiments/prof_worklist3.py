"""Marginal on-device cost per phase: run phase 1x vs 2x inside one jit,
difference = device cost (cancels the ~30ms tunnel dispatch floor)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from directcomputeraytracing_tpu.accel import worklist as wl
from directcomputeraytracing_tpu.accel.pallas_brute import (
    RAY_BLOCK, _cull_masks, _pad_cluster_tables, _prep_rays,
)
from directcomputeraytracing_tpu.integrator.common import RenderConfig
from directcomputeraytracing_tpu.scene.presets import sphere_grid
from directcomputeraytracing_tpu.scene.scene import flatten_scene
from experiments.check_worklist import rays_for
from experiments.prof_worklist2 import compact_scatter, timeit

I32 = jnp.int32


def marginal(make_fn, *args, reps=6):
    """make_fn(k) -> jit fn running the phase k times (anti-CSE)."""
    f1, f2 = make_fn(1), make_fn(2)
    _, t1 = timeit(f1, *args, reps=reps)
    _, t2 = timeit(f2, *args, reps=reps)
    return t2 - t1, t1


def main():
    scene, cam = sphere_grid(5, 5)
    arrays, meta = flatten_scene(scene)
    cfg = RenderConfig(width=1024, height=1024, max_bounce=1,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count)
    od = rays_for(cam, cfg)
    o, d, r = _prep_rays(*od)
    ctabs = _pad_cluster_tables(arrays)
    _, n_wgroups = wl._pad_wl_table(arrays)
    n_blocks = o.shape[1] // RAY_BLOCK
    capacity = wl._capacity_for(n_blocks, n_wgroups)

    def mk_cull(k):
        @jax.jit
        def f(o, d):
            out = 0.0
            for j in range(k):
                out = out + _cull_masks(ctabs, o + 1e-7 * j, d)[0]
            return out
        return f

    dm, t1 = marginal(mk_cull, o, d)
    print(f"cull: marginal={dm*1e3:.2f} ms (1x wall {t1*1e3:.1f})")

    mask = jax.jit(lambda o, d: _cull_masks(ctabs, o, d)[0])(o, d)
    mask = jax.block_until_ready(mask)

    def mk_compact_nz(k):
        @jax.jit
        def f(m):
            out = 0
            for j in range(k):
                out = out + wl._compact(m + j, n_wgroups, capacity)[0]
            return out
        return f

    def mk_compact_sc(k):
        @jax.jit
        def f(m):
            out = 0
            for j in range(k):
                out = out + compact_scatter(m + j, n_wgroups, capacity)[0]
            return out
        return f

    dm, t1 = marginal(mk_compact_nz, mask)
    print(f"compact nonzero: marginal={dm*1e3:.2f} ms (1x {t1*1e3:.1f})")
    dm, t1 = marginal(mk_compact_sc, mask)
    print(f"compact scatter: marginal={dm*1e3:.2f} ms (1x {t1*1e3:.1f})")

    def mk_full(k):
        @jax.jit
        def f(po, pd):
            acc = 0.0
            for j in range(k):
                acc = acc + wl.worklist_closest_pallas(
                    arrays, po + 1e-7 * j, pd)[0]
            return acc
        return f

    dm, t1 = marginal(mk_full, *od)
    print(f"full pipeline: marginal={dm*1e3:.2f} ms (1x {t1*1e3:.1f}) -> "
          f"{r/dm/1e6:.1f} Mrays/s device-side")


if __name__ == "__main__":
    main()
