"""Coherent camera-cast timing on the 212k bench scene (the bench's
own ray recipe) — measures the sel-skip gate and env-knob sweeps."""
import sys
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

n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
scene, cam = sphere_grid(n, n)
arrays, meta = flatten_scene(scene)
w = h = 2048
cfg = RenderConfig(width=w, height=h, max_bounce=1,
                   stack_size=meta.stack_size, light_count=0)
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
R = o.shape[0]
light_p = jnp.asarray([0.0, 6.0, 0.0], jnp.float32)


@jax.jit
def ext(o, d):
    return intersect_closest(arrays, o, d, cfg.stack_size,
                             backend="pallas_wl").t.sum()


@jax.jit
def shadow(o, d):
    org = o + 0.5 * d
    wi = light_p[None, :] - org
    dist = jnp.linalg.norm(wi, axis=-1, keepdims=True)
    wi = wi / jnp.maximum(dist, 1e-6)
    occ = intersect_any(arrays, org, wi, dist[:, 0], cfg.stack_size,
                        backend="pallas_wl")
    return occ.sum().astype(jnp.float32)


def timed(fn, reps=4):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(o, d) if fn in (ext, shadow) else fn())
        best = min(best, time.perf_counter() - t0)
    return best


t_e = timed(lambda: float(ext(o, d)))
t_s = timed(lambda: float(shadow(o, d)))
print(f"closest {t_e*1e3:8.1f} ms  {R/t_e/1e6:6.2f} Mrays/s", flush=True)
print(f"any     {t_s*1e3:8.1f} ms  {R/t_s/1e6:6.2f} Mrays/s", flush=True)
print(f"combined {2*R/(t_e+t_s)/1e6:6.2f} Mrays/s", flush=True)
