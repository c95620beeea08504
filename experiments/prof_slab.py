"""A/B the two-phase distance-slab closest cast on coherent camera
rays (the bench's own harness: 212k-tri sphere grid, 4M tile-ordered
rays) and on shadow rays. Usage: prof_slab.py [n=12] [w=2048].
Run on the real TPU."""
import sys
import time

import jax
import jax.numpy as jnp

from directcomputeraytracing_tpu.accel.traverse import (
    intersect_closest, intersect_closest_slab,
)
from directcomputeraytracing_tpu.camera.camera import generate_ray
from directcomputeraytracing_tpu.integrator.common import RenderConfig
from directcomputeraytracing_tpu.integrator.megakernel import (
    tiled_frame_pixels,
)
from directcomputeraytracing_tpu.rng.xoshiro import (
    init_rng, next_sample_2d, next_sample_3d,
)
from directcomputeraytracing_tpu.scene.presets import sphere_grid
from directcomputeraytracing_tpu.scene.scene import flatten_scene

n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
w = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
scene, cam = sphere_grid(n, n)
arrays, meta = flatten_scene(scene)
h = w
nrays = w * h
cfg = RenderConfig(width=w, height=h, max_bounce=1,
                   stack_size=meta.stack_size,
                   light_count=meta.light_count)
px, py, _ = tiled_frame_pixels(cfg)


@jax.jit
def make_rays(seed):
    rng = init_rng(px, py, seed)
    rng, jitter = next_sample_2d(rng)
    res = jnp.asarray([w, h], jnp.float32)
    pix = jnp.stack([px, py], -1).astype(jnp.float32)
    rng, ap = next_sample_3d(rng)
    return generate_ray(cam, (jitter + pix) / res, ap)


o, d = jax.block_until_ready(make_rays(jnp.uint32(0)))
root_lo = arrays.node_bbox_min[0]
root_hi = arrays.node_bbox_max[0]
diag = float(jnp.sqrt(jnp.sum((root_hi - root_lo) ** 2)))
print(f"tris ~{arrays.world_tris.shape[0]} diag {diag:.2f}", flush=True)


def timed(f, reps=3):
    f()  # compile + warm
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best


@jax.jit
def base(o, d):
    return intersect_closest(arrays, o, d, cfg.stack_size).t.sum()


t = timed(lambda: float(base(o, d)))
print(f"single:     {t * 1e3:8.1f} ms  {nrays / t / 1e6:6.1f} Mrays/s",
      flush=True)

for frac in (0.05, 0.1, 0.2, 0.4):
    D = jnp.float32(frac * diag)

    @jax.jit
    def slab(o, d, D=D):
        return intersect_closest_slab(
            arrays, o, d, cfg.stack_size, D).t.sum()

    # sanity: exact agreement with the single cast
    sv = float(slab(o, d))
    bv = float(base(o, d))
    t = timed(lambda: float(slab(o, d)))
    print(f"slab {frac:4}: {t * 1e3:8.1f} ms  "
          f"{nrays / t / 1e6:6.1f} Mrays/s   sum {sv:.1f} vs {bv:.1f}",
          flush=True)
print("done", flush=True)
