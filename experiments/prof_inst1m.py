"""Phase-split profile of the INSTANCED work-list path on the bench's
1.07M-tri row (27x27 sphere grid, BLAS-sharing instanced tables) —
VERDICT r3 #8: the row runs 21.9 Mrays/s vs ~50 on the 212k world soup.
Times each phase of the cast separately to locate the gap:
hyper cull / refine / expand+finish (phases A-B) vs the fused sweep,
plus item-count + swept-cluster statistics.
"""
import time

import jax
import jax.numpy as jnp

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

N = 27
scene, cam = sphere_grid(N, N)
arrays, meta = flatten_scene(scene)
assert wl._instanced(arrays), "expected instanced tables"
w = h = 1024
NR = w * h
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


def timed(label, fn, reps=3):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:36s} {best*1e3:8.2f} ms  "
          f"{NR/best/1e6:7.1f} Mrays/s", flush=True)
    return best


# ---- table shapes -----------------------------------------------------
tabs, cbox3, sboxv, cpad, cs, hyper = wl._pad_tables_instanced(arrays)
print(f"instanced supers (items)   : {cs}")
print(f"hyper count                : {hyper[2]}  fanout {hyper[3]}")
print(f"tri slab rows              : {arrays.icl_slab.shape}")
print(f"instances                  : {arrays.instance_transforms.shape[0]}")

od, tm, _ = wl._prep_rays_wl(o, d)
nb = od.shape[1] // wl.RB
cap_s = wl._capacity(nb, cs)
hsup, hboxv, nh, hs = hyper
hm = 8
cap_h = int(min(max(nb * hm, 1024), wl.MAX_HYPER, nb * nh))
print(f"blocks {nb}  cap_h {cap_h}  cap_s {cap_s}")


@jax.jit
def prep(o, d):
    od, tm, _ = wl._prep_rays_wl(o, d)
    return od, tm


@jax.jit
def ph_hyper(od, tm):
    return wl._cull_super(hboxv, od, tm)


@jax.jit
def ph_compact(tlo_h):
    return wl._compact_pairs(tlo_h, nh, cap_h)


@jax.jit
def ph_refine(bfh, hyp, od, tm):
    return wl._refine_items(hsup, hs, bfh, hyp, od, tm, cap_h, False)


@jax.jit
def ph_expand(tlo_s, bfh, hyp):
    return wl._expand_level(tlo_s, bfh, hyp, hs, cs, nb, cap_s)


@jax.jit
def ph_all(o, d):
    od, tm, _ = wl._prep_rays_wl(o, d)
    out = wl._phases(arrays, od, tm, False)
    return out[2], out[3], out[4], out[5], out[6]


od_, tm_ = jax.block_until_ready(prep(o, d))
tlo_h = jax.block_until_ready(ph_hyper(od_, tm_))
bfh, hyp, _th, total_h, _ = jax.block_until_ready(ph_compact(tlo_h))
tlo_s = jax.block_until_ready(ph_refine(bfh, hyp, od_, tm_))
bf_s, sup, t_s, total_s = jax.block_until_ready(
    ph_expand(tlo_s, bfh, hyp))
print(f"total_h {int(total_h)} (cap {cap_h})  "
      f"total_s {int(total_s)} (cap {cap_s})  "
      f"items/block {int(total_s)/nb:.1f}")

timed("prep", lambda: jax.block_until_ready(prep(o, d)))
timed("A: hyper cull", lambda: jax.block_until_ready(ph_hyper(od_, tm_)))
timed("A: compact", lambda: jax.block_until_ready(ph_compact(tlo_h)))
timed("B: refine", lambda: jax.block_until_ready(
    ph_refine(bfh, hyp, od_, tm_)))
timed("B: expand+finish", lambda: jax.block_until_ready(
    ph_expand(tlo_s, bfh, hyp)))
timed("phases total", lambda: jax.block_until_ready(ph_all(o, d)))


# ---- full casts (host-readback timed like the bench) ------------------
@jax.jit
def closest(o, d):
    return intersect_closest(arrays, o, d, cfg.stack_size).t.sum()


@jax.jit
def closest_iters(o, d):
    h = intersect_closest(arrays, o, d, cfg.stack_size)
    return h.t.sum(), h.iterations.astype(jnp.float32).mean()


@jax.jit
def anyh(o, d):
    light_p = jnp.asarray([0.0, 6.0, 0.0], jnp.float32)
    org = o + 0.5 * d
    wi = light_p[None, :] - org
    dist = jnp.linalg.norm(wi, axis=-1, keepdims=True)
    wi = wi / jnp.maximum(dist, 1e-6)
    return intersect_any(arrays, org, wi, dist[:, 0],
                         cfg.stack_size).sum().astype(jnp.float32)


timed("closest cast", lambda: float(closest(o, d)))
timed("any cast", lambda: float(anyh(o, d)))
_, it = closest_iters(o, d)
print(f"mean swept clusters/block    : {float(it):.1f}")
