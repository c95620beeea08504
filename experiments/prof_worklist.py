"""Phase-level profiling of the work-list traversal."""

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


def timeit(fn, *args, reps=4):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    jax.tree_util.tree_map(
        lambda x: float(jnp.asarray(x).ravel()[0].astype(jnp.float32)), out)
    return out, (time.perf_counter() - t0) / reps


def main():
    for n in (5, 9):
        scene, cam = sphere_grid(n, n)
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
        comp = jax.jit(lambda m: wl._compact(m, n_wgroups, capacity))
        (items, total, block_any), dt_comp = timeit(comp, mask)
        total = int(total)

        m = np.asarray(mask)[:, : n_wgroups * 4].reshape(
            n_blocks, n_wgroups, 4).max(2)
        per_block = m.sum(1)
        print(f"--- sphere_grid({n}): blocks={n_blocks} "
              f"wgroups={n_wgroups} capacity={capacity}")
        print(f"total={total} overflow={total > capacity} "
              f"per-block wgroups: mean={per_block.mean():.1f} "
              f"p50={np.percentile(per_block, 50):.0f} "
              f"max={per_block.max():.0f}")
        print(f"cull={dt_cull*1e3:.2f}ms compact={dt_comp*1e3:.2f}ms")

        full = jax.jit(lambda o, d: wl.worklist_closest_pallas(
            arrays, o, d)[0])
        _, dt_full = timeit(full, *od)
        print(f"full={dt_full*1e3:.1f}ms -> {r/dt_full/1e6:.1f} Mrays/s "
              f"(sweep≈{(dt_full-dt_cull-dt_comp)*1e3:.1f}ms, "
              f"{(dt_full-dt_cull-dt_comp)/max(total,1)*1e9:.0f}ns/item)")


if __name__ == "__main__":
    main()
