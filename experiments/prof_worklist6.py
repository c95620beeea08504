"""Phase-resolved timing of the hierarchical worklist closest path."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from directcomputeraytracing_tpu.accel import worklist as wl
from directcomputeraytracing_tpu.integrator.common import RenderConfig
from directcomputeraytracing_tpu.scene.presets import sphere_grid
from directcomputeraytracing_tpu.scene.scene import flatten_scene
from experiments.check_worklist import rays_for

F32 = jnp.float32


def timeit(fn, *args, reps=6):
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
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    scene, cam = sphere_grid(n, n)
    arrays, meta = flatten_scene(scene)
    cfg = RenderConfig(width=1024, height=1024, max_bounce=1,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count)
    odpair = rays_for(cam, cfg)
    od, odt, _, r = wl._prep_rays_wl(*odpair)
    od, odt = jax.block_until_ready((od, odt))
    rp = od.shape[1]
    print(f"tris={arrays.world_tris.shape[0]}")

    t = timeit(jax.jit(
        lambda od, odt: wl._phases(arrays, od, odt, False)), od, odt)
    print(f"phases (A+B hier): {t*1e3:.2f} ms")

    t = timeit(jax.jit(functools_closest), odpair[0], odpair[1]) \
        if False else timeit(
        jax.jit(lambda o, d: wl.worklist_closest_pallas(arrays, o, d)),
        *odpair)
    print(f"full closest (incl post): {t*1e3:.2f} ms "
          f"-> {r/t/1e6:.1f} Mrays/s")

    t = timeit(jax.jit(
        lambda o, d: wl.worklist_any_pallas(arrays, o, d, jnp.inf)),
        *odpair)
    print(f"full any: {t*1e3:.2f} ms -> {r/t/1e6:.1f} Mrays/s")


if __name__ == "__main__":
    main()
