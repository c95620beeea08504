"""Where do the 4M-ray bench casts spend time? Fixed dispatch latency,
per-slice prep/phases/sweep via a lax.map mirror of the internal
slicing, plus a K-chained throughput measurement (dispatch-latency
amortized, the production regime)."""
import time

import jax
import jax.numpy as jnp

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
    print(f"{label:28s} {best*1e3:9.1f} ms", flush=True)
    return best


@jax.jit
def nop(o=o):
    return o[::4096].sum()


@jax.jit
def prep4(o=o, d=d):
    (os_, ds_), _r = wl._slice_rays(o, d)
    def f(od):
        odr, tm, _ = wl._prep_rays_wl(od[0], od[1])
        return odr.sum() + tm.sum()
    return jax.lax.map(f, (os_, ds_)).sum()


@jax.jit
def phases4(o=o, d=d):
    (os_, ds_), _r = wl._slice_rays(o, d)
    def f(od):
        odr, tm, _ = wl._prep_rays_wl(od[0], od[1])
        outs = wl._phases(arrays, odr, tm, False)
        return (outs[2].sum().astype(jnp.float32) + outs[4].sum())
    return jax.lax.map(f, (os_, ds_)).sum()


@jax.jit
def full(o=o, d=d):
    return intersect_closest(arrays, o, d, cfg.stack_size,
                             backend="pallas_wl").t.sum()


@jax.jit
def full_k4(o=o, d=d):
    # 4 dependent casts in ONE dispatch: per-dispatch latency amortized
    s = jnp.float32(0.0)
    oo = o
    for k in range(4):
        s = s + intersect_closest(arrays, oo, d, cfg.stack_size,
                                  backend="pallas_wl").t.sum()
        oo = o + 1e-6 * k  # defeat CSE, keep the workload identical
    return s


bench("nop dispatch", lambda: float(nop()))
bench("prep x4 slices", lambda: float(prep4()))
bench("prep+phases x4", lambda: float(phases4()))
t = bench("full closest 4M", lambda: float(full()))
tk = bench("full closest 4M x4-chain", lambda: float(full_k4()))
print(f"throughput sync {R/t/1e6:6.2f}  chained {4*R/tk/1e6:6.2f} "
      f"Mrays/s", flush=True)
