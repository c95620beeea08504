"""Pixel-tile shape A/B for bundle frustum tightness: 8x128 strips vs
square-ish tiles, on the bench traversal harness at 212k tris."""
import os
import time

import jax
import jax.numpy as jnp

from directcomputeraytracing_tpu.accel.traverse import (
    intersect_any, intersect_closest,
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

print("PAIR =", os.environ.get("DCRT_WL_PAIR", "2"), flush=True)
scene, cam = sphere_grid(12, 12)
arrays, meta = flatten_scene(scene)
w = h = 2048
NR = w * h
cfg = RenderConfig(width=w, height=h, max_bounce=1,
                   stack_size=meta.stack_size,
                   light_count=meta.light_count)
light_p = jnp.asarray([0.0, 6.0, 0.0], jnp.float32)


@jax.jit
def make_rays(px, py, seed):
    rng = init_rng(px, py, seed)
    rng, jitter = next_sample_2d(rng)
    res = jnp.asarray([w, h], jnp.float32)
    pix = jnp.stack([px, py], -1).astype(jnp.float32)
    rng, ap = next_sample_3d(rng)
    return generate_ray(cam, (jitter + pix) / res, ap)


@jax.jit
def ext(o, d):
    return intersect_closest(arrays, o, d, cfg.stack_size).iterations \
        .sum()


@jax.jit
def shadow(o, d):
    org = o + 0.5 * d
    wi = light_p[None, :] - org
    dist = jnp.linalg.norm(wi, axis=-1, keepdims=True)
    wi = wi / jnp.maximum(dist, 1e-6)
    occ = intersect_any(arrays, org, wi, dist[:, 0], cfg.stack_size)
    return occ.sum().astype(jnp.float32)


def timed(fn, reps=3):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


for th, tw in ((8, 128), (16, 64), (32, 32), (64, 16)):
    px, py, _ = tiled_frame_pixels(cfg, tile_h=th, tile_w=tw)
    o, d = jax.block_until_ready(make_rays(px, py, jnp.uint32(0)))
    swept = float(ext(o, d)) / NR
    t_e = timed(lambda: float(ext(o, d)))
    t_s = timed(lambda: float(shadow(o, d)))
    print(f"tile {th:3d}x{tw:3d}: closest {NR/t_e/1e6:6.1f} any "
          f"{NR/t_s/1e6:6.1f} comb {2*NR/(t_e+t_s)/1e6:6.1f} Mrays/s "
          f"(swept/ray {swept:.1f})", flush=True)
print("done", flush=True)
