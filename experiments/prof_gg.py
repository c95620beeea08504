"""A/B: group-gated bundle closest sweep (DCRT_WL_GG) on the bench's
212k-tri coherent camera casts, measured exactly like bench.py's
traversal rows (K=4 chained casts per dispatch, host-readback timed).
Run twice: DCRT_WL_GG=0 python ... ; DCRT_WL_GG=1 python ...
"""
import os
import time

import jax
import jax.numpy as jnp

os.environ.setdefault("DCRT_WL_SLICE_LOG2", "22")

cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_compile_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from directcomputeraytracing_tpu.accel import worklist as wl
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

print("GG =", wl._GG, flush=True)

for label, n, w in (("36k", 5, 2048), ("212k", 12, 2048)):
    scene, cam = sphere_grid(n, n)
    arrays, meta = flatten_scene(scene)
    h = w
    NR = w * h
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
    K = 4

    @jax.jit
    def ext(o, d):
        def body(c, k):
            hit = intersect_closest(
                arrays, o + 1e-6 * k.astype(jnp.float32), d,
                cfg.stack_size)
            return c + hit.t.sum(), ()
        s, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return s

    def timed(fn, reps=3):
        fn()
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    light_p = jnp.asarray([0.0, 6.0, 0.0], jnp.float32)

    @jax.jit
    def shadow(o, d):
        def body(c, k):
            org = o + 0.5 * d + 1e-6 * k.astype(jnp.float32)
            wi = light_p[None, :] - org
            dist = jnp.linalg.norm(wi, axis=-1, keepdims=True)
            wi = wi / jnp.maximum(dist, 1e-6)
            occ = intersect_any(arrays, org, wi, dist[:, 0],
                                cfg.stack_size)
            return c + occ.sum().astype(jnp.float32), ()
        s, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return s

    t_ext = timed(lambda: float(ext(o, d))) / K
    t_shd = timed(lambda: float(shadow(o, d))) / K
    comb = 2 * NR / (t_ext + t_shd) / 1e6
    print(f"{label} closest: {t_ext*1e3:8.2f} ms  "
          f"{NR/t_ext/1e6:7.2f} Mrays/s | any: {t_shd*1e3:8.2f} ms  "
          f"{NR/t_shd/1e6:7.2f} Mrays/s | combined {comb:7.2f}",
          flush=True)
print("done", flush=True)
