"""Robust phase timings: min-of-reps with forced readback per rep."""

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

I32 = jnp.int32


def timeit(fn, *args, reps=8):
    red = jax.jit(lambda o: jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32)), o, 0.0))
    out = fn(*args)
    float(red(out))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(red(out))
        best = min(best, time.perf_counter() - t0)
    return out, best


def compact_scatter(mask, n_wgroups, capacity):
    """nonzero-free compaction: row cumsum for first-flags, global
    cumsum for positions, one scatter."""
    n_blocks = mask.shape[0]
    gm = mask[:, : n_wgroups * wl.WORK_GROUP].reshape(
        n_blocks, n_wgroups, wl.WORK_GROUP).max(axis=2) > 0.0
    rowcum = jnp.cumsum(gm, axis=1, dtype=I32)
    first = gm & (rowcum == 1)
    cum = jnp.cumsum(gm.ravel(), dtype=I32)
    total = cum[-1]
    pos = jnp.where(gm.ravel(), cum - 1, capacity)
    blk = jax.lax.broadcasted_iota(I32, gm.shape, 0)
    grp = jax.lax.broadcasted_iota(I32, gm.shape, 1)
    payload = ((blk << wl._BLOCK_SHIFT) | (grp << wl._GROUP_SHIFT)
               | (first.astype(I32) << 1) | 1)
    pad_item = (n_blocks - 1) << wl._BLOCK_SHIFT
    items = jnp.full((capacity,), pad_item, I32).at[pos].set(
        payload.ravel(), mode="drop")
    return items, total, jnp.any(gm, axis=1)


def main():
    scene, cam = sphere_grid(5, 5)
    arrays, meta = flatten_scene(scene)
    cfg = RenderConfig(width=1024, height=1024, max_bounce=1,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count)
    od = rays_for(cam, cfg)
    o, d, r = _prep_rays(*od)
    n_blocks = o.shape[1] // RAY_BLOCK
    ctabs = _pad_cluster_tables(arrays)
    _, n_wgroups = wl._pad_wl_table(arrays)
    capacity = wl._capacity_for(n_blocks, n_wgroups)

    cull = jax.jit(lambda o, d: _cull_masks(ctabs, o, d)[0])
    mask, dt_cull = timeit(cull, o, d)
    print(f"cull: {dt_cull*1e3:.2f} ms")

    comp_nz = jax.jit(lambda m: wl._compact(m, n_wgroups, capacity))
    outs, dt_nz = timeit(comp_nz, mask)
    print(f"compact(nonzero): {dt_nz*1e3:.2f} ms, total={int(outs[1])}")

    comp_sc = jax.jit(
        lambda m: compact_scatter(m, n_wgroups, capacity))
    outs2, dt_sc = timeit(comp_sc, mask)
    print(f"compact(scatter): {dt_sc*1e3:.2f} ms, total={int(outs2[1])}")
    same = bool(jnp.all(outs[0] == outs2[0]))
    print(f"items identical: {same}")

    full = jax.jit(lambda o, d: wl.worklist_closest_pallas(arrays, o, d))
    _, dt_full = timeit(full, *od)
    print(f"full worklist: {dt_full*1e3:.1f} ms "
          f"({r/dt_full/1e6:.1f} Mrays/s)")
    sweep = dt_full - dt_cull - dt_nz
    print(f"sweep estimate: {sweep*1e3:.1f} ms "
          f"({sweep/max(int(outs[1]),1)*1e9:.0f} ns/item)")


if __name__ == "__main__":
    main()
