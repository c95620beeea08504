"""A/B: worklist traversal throughput with rows-layout rays vs (R, 3)
columns at 212k tris (the bench harness, both ray forms)."""
import time

import jax
import jax.numpy as jnp

from directcomputeraytracing_tpu.accel.traverse import (
    intersect_any,
    intersect_closest,
)
from directcomputeraytracing_tpu.camera.camera import (
    generate_ray,
    generate_ray_rows,
)
from directcomputeraytracing_tpu.integrator.common import RenderConfig
from directcomputeraytracing_tpu.integrator.megakernel import (
    tiled_frame_pixels,
)
from directcomputeraytracing_tpu.rng.xoshiro import (
    init_rng,
    next_sample_2d,
    next_sample_3d,
)
from directcomputeraytracing_tpu.scene.presets import sphere_grid
from directcomputeraytracing_tpu.scene.scene import flatten_scene


def timed(label, fn, reps=3):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:34s} {best*1e3:8.2f} ms  "
          f"{NR/best/1e6:7.1f} Mrays/s", flush=True)
    return best


for label, n in (("212k", 12),):
    scene, cam = sphere_grid(n, n)
    arrays, meta = flatten_scene(scene)
    w = h = 2048
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

    @jax.jit
    def make_rays_rows(seed):
        rng = init_rng(px, py, seed)
        rng, jitter = next_sample_2d(rng)
        fx = (jitter[:, 0] + px.astype(jnp.float32)) / w
        fy = (jitter[:, 1] + py.astype(jnp.float32)) / h
        rng, ap = next_sample_3d(rng)
        return generate_ray_rows(cam, fx, fy, ap[:, 0], ap[:, 1],
                                 ap[:, 2])

    o, d = jax.block_until_ready(make_rays(jnp.uint32(0)))
    orw, drw = jax.block_until_ready(make_rays_rows(jnp.uint32(0)))

    light_p = jnp.asarray([0.0, 6.0, 0.0], jnp.float32)

    @jax.jit
    def ext(o, d):
        return intersect_closest(arrays, o, d, cfg.stack_size).t.sum()

    @jax.jit
    def ext_rows(orw, drw):
        return intersect_closest(arrays, None, None, cfg.stack_size,
                                 rays_rows=(orw, drw)).t.sum()

    @jax.jit
    def shadow(o, d):
        org = o + 0.5 * d
        wi = light_p[None, :] - org
        dist = jnp.linalg.norm(wi, axis=-1, keepdims=True)
        wi = wi / jnp.maximum(dist, 1e-6)
        occ = intersect_any(arrays, org, wi, dist[:, 0], cfg.stack_size)
        return occ.sum().astype(jnp.float32)

    @jax.jit
    def shadow_rows(orw, drw):
        org = orw + 0.5 * drw
        wi = light_p[:, None] - org
        dist = jnp.sqrt(jnp.sum(wi * wi, axis=0, keepdims=True))
        wi = wi / jnp.maximum(dist, 1e-6)
        occ = intersect_any(arrays, None, None, dist[0], cfg.stack_size,
                            rays_rows=(org, wi))
        return occ.sum().astype(jnp.float32)

    t_e = timed(f"{label} closest cols", lambda: float(ext(o, d)))
    t_er = timed(f"{label} closest ROWS", lambda: float(ext_rows(orw,
                                                                 drw)))
    t_s = timed(f"{label} any cols", lambda: float(shadow(o, d)))
    t_sr = timed(f"{label} any ROWS", lambda: float(shadow_rows(orw,
                                                                drw)))
    print(f"combined cols {2*NR/(t_e+t_s)/1e6:7.1f}  "
          f"ROWS {2*NR/(t_er+t_sr)/1e6:7.1f} Mrays/s", flush=True)
    # agreement spot check
    a = float(ext(o, d))
    b = float(ext_rows(jnp.asarray(jnp.asarray(o).T),
                       jnp.asarray(jnp.asarray(d).T)))
    print(f"t-sum cols {a:.1f} rows-of-same-rays {b:.1f}", flush=True)
print("done", flush=True)
