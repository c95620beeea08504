"""Controlled: scan-chain vs unrolled-chain K=4 at 4M rays."""
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

scene, cam = sphere_grid(12, 12)
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
K = 4


@jax.jit
def ext_scan(o=o, d=d):
    def body(c, k):
        t = intersect_closest(arrays, o + 1e-6 * k.astype(jnp.float32),
                              d, cfg.stack_size,
                              backend="pallas_wl").t.sum()
        return c + t, ()
    s, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
    return s


@jax.jit
def any_scan(o=o, d=d):
    def body(c, k):
        org = o + 0.5 * d + 1e-6 * k.astype(jnp.float32)
        wi = light_p[None, :] - org
        dist = jnp.linalg.norm(wi, axis=-1, keepdims=True)
        wi = wi / jnp.maximum(dist, 1e-6)
        occ = intersect_any(arrays, org, wi, dist[:, 0],
                            cfg.stack_size, backend="pallas_wl")
        return c + occ.sum().astype(jnp.float32), ()
    s, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
    return s


def bench(label, fn, reps=4):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn())
        best = min(best, time.perf_counter() - t0)
    print(f"{label:24s} {best*1e3:9.1f} ms  "
          f"{K*R/best/1e6:7.2f} Mrays/s", flush=True)
    return best


te = bench(f"closest scan x{K} @4M", ext_scan)
ta = bench(f"any     scan x{K} @4M", any_scan)
print(f"combined {2*K*R/(te+ta)/1e6:7.2f} Mrays/s", flush=True)
