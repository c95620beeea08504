"""Bundle frustum compactness: tile shape vs swept clusters / Mrays.

The sweep kernel is near vector-issue-bound (docs/PERF.md), so closest
throughput scales with clusters swept per 1024-ray block. 8x128 tiles
(the lane-layout default) have wide frusta; squarer tiles should shrink
the per-block cluster union. Usage:

    python experiments/prof_tileshape.py [n [w]]
"""
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
w = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
scene, cam = sphere_grid(n, n)
arrays, meta = flatten_scene(scene)
h = w
nrays = w * h
cfg = RenderConfig(width=w, height=h, max_bounce=1,
                   stack_size=meta.stack_size,
                   light_count=meta.light_count)
light_p = jnp.asarray([0.0, 6.0, 0.0], jnp.float32)

for th, tw in ((8, 128), (16, 64), (32, 32), (64, 16), (8, 256),
               (4, 256)):
    px, py, _ = tiled_frame_pixels(cfg, tile_h=th, tile_w=tw)

    @jax.jit
    def make_rays(seed, px=px, py=py):
        rng = init_rng(px, py, seed)
        rng, jitter = next_sample_2d(rng)
        res = jnp.asarray([w, h], jnp.float32)
        pix = jnp.stack([px, py], -1).astype(jnp.float32)
        rng, ap = next_sample_3d(rng)
        return generate_ray(cam, (jitter + pix) / res, ap)

    o, d = jax.block_until_ready(make_rays(jnp.uint32(0)))

    @jax.jit
    def ext(o, d):
        hit = intersect_closest(arrays, o, d, cfg.stack_size)
        return hit.t.sum(), hit.iterations.astype(jnp.float32).mean()

    @jax.jit
    def shadow(o, d):
        org = o + 0.5 * d
        wi = light_p[None, :] - org
        dist = jnp.linalg.norm(wi, axis=-1, keepdims=True)
        wi = wi / jnp.maximum(dist, 1e-6)
        occ = intersect_any(arrays, org, wi, dist[:, 0], cfg.stack_size)
        return occ.sum().astype(jnp.float32)

    ts, swept = ext(o, d)
    float(ts)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        ts, swept = ext(o, d)
        float(ts)
        best = min(best, time.perf_counter() - t0)
    float(shadow(o, d))
    besta = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(shadow(o, d))
        besta = min(besta, time.perf_counter() - t0)
    comb = 2 * nrays / (best + besta) / 1e6
    print(f"tile {th:3d}x{tw:3d}: closest {nrays/best/1e6:6.1f} "
          f"any {nrays/besta/1e6:6.1f} comb {comb:6.1f} Mrays/s  "
          f"swept/ray {float(swept):7.2f}", flush=True)
