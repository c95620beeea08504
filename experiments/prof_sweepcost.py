"""Decompose the coherent closest cast: prep, phases, sweep; swept
clusters and implied per-step cost."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from directcomputeraytracing_tpu.accel import worklist as wl
from directcomputeraytracing_tpu.accel.traverse import intersect_closest
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


def bench(label, fn, reps=4):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:24s} {best*1e3:9.1f} ms", flush=True)
    return best


# slice to 1M rays (one lax.map slice worth) for clean decomposition
o1, d1 = o[:1 << 20], d[:1 << 20]


@jax.jit
def prep_only(o=o1, d=d1):
    od, tm, _r = wl._prep_rays_wl(o, d)
    return od.sum() + tm.sum()


@jax.jit
def phases_only(o=o1, d=d1):
    od, tm, _r = wl._prep_rays_wl(o, d)
    outs = wl._phases(arrays, od, tm, False)
    return (outs[2].sum().astype(jnp.float32) + outs[4].sum()
            + outs[3].astype(jnp.float32).sum())


@jax.jit
def full(o=o1, d=d1):
    return intersect_closest(arrays, o, d, cfg.stack_size,
                             backend="pallas_wl").t.sum()


bench("prep (1M)", lambda: float(prep_only()))
bench("prep+phases (1M)", lambda: float(phases_only()))
bench("full closest (1M)", lambda: float(full()))

hit = intersect_closest(arrays, o1, d1, cfg.stack_size,
                        backend="pallas_wl")
it = np.asarray(hit.iterations)
print(f"swept clusters: mean/ray {it.mean():.2f}  p50 "
      f"{np.percentile(it, 50):.0f}  p95 {np.percentile(it, 95):.0f}",
      flush=True)
od, tm, _ = wl._prep_rays_wl(o1, d1)
outs = wl._phases(arrays, od, tm, False)
bf = np.asarray(outs[2])
print(f"items={int(((bf & 1) == 1).sum())} cap={outs[7]} "
      f"blocks={od.shape[1] // wl.RB}", flush=True)
