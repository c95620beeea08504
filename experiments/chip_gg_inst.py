"""One-process chip session: (1) group-gating A/B on the bench's
coherent camera casts (36k + 212k scenes, closest + any), (2) the
instanced 1M-tri row — phase item census + cast timings + gating A/B.
Batched into one process because each new tunnel client pays a
multi-minute chip grant wait.

Gating is a trace-time flag (worklist._GG): distinct wrapper functions
are defined AFTER flipping it so each traces with its own value.
"""
import os
import time

import numpy as np
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


def timed(fn, reps=3):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def rays_for(cam, px, py, w, h):
    @jax.jit
    def make(seed):
        rng = init_rng(px, py, seed)
        rng, jitter = next_sample_2d(rng)
        res = jnp.asarray([w, h], jnp.float32)
        pix = jnp.stack([px, py], -1).astype(jnp.float32)
        rng, ap = next_sample_3d(rng)
        return generate_ray(cam, (jitter + pix) / res, ap)
    return jax.block_until_ready(make(jnp.uint32(0)))


def cast_rows(arrays, cfg, o, d, K, NR, label):
    light_p = jnp.asarray([0.0, 6.0, 0.0], jnp.float32)

    @jax.jit
    def ext(o, d):
        def body(c, k):
            hit = intersect_closest(
                arrays, o + 1e-6 * k.astype(jnp.float32), d,
                cfg.stack_size)
            return c + hit.t.sum(), ()
        s, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return s

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
    print(f"{label}: closest {NR/t_ext/1e6:7.2f} | any "
          f"{NR/t_shd/1e6:7.2f} | combined {comb:7.2f} Mrays/s",
          flush=True)
    time.sleep(2.0)


# ---- part 1: gg A/B on the coherent bench casts ---------------------
scenes = {}
for label, n, w in (("36k", 5, 2048), ("212k", 12, 2048)):
    scene, cam = sphere_grid(n, n)
    arrays, meta = flatten_scene(scene)
    h = w
    cfg = RenderConfig(width=w, height=h, max_bounce=1,
                       stack_size=meta.stack_size,
                       light_count=meta.light_count)
    px, py, _ = tiled_frame_pixels(cfg)
    o, d = rays_for(cam, px, py, w, h)
    scenes[label] = (arrays, cfg, o, d, w * h)

for gg in (False, True):
    wl._GG = gg
    for label in ("36k", "212k"):
        arrays, cfg, o, d, NR = scenes[label]
        cast_rows(arrays, cfg, o, d, 4, NR, f"gg={int(gg)} {label}")
del scenes

# ---- part 2: instanced 1M row ---------------------------------------
N = 27
scene, cam = sphere_grid(N, N)
arrays, meta = flatten_scene(scene)
assert wl._instanced(arrays), "expected instanced tables"
w = h = 1024
NR = w * h
cfg = RenderConfig(width=w, height=h, max_bounce=1,
                   stack_size=meta.stack_size, light_count=0)
px, py, _ = tiled_frame_pixels(cfg)
o, d = rays_for(cam, px, py, w, h)

tabs, cbox3, sboxv, cpad, cs, hyper = wl._pad_tables_instanced(arrays)
print(f"1M: supers={cs} hyper={hyper[2]}x{hyper[3]} "
      f"slab_rows={arrays.icl_slab.shape}", flush=True)


@jax.jit
def phase_stats(o, d):
    od, tm, _ = wl._prep_rays_wl(o, d)
    out = wl._phases(arrays, od, tm, False)
    blkflags, fits = out[2], out[5]
    valid = (blkflags & 1) == 1
    blk = (blkflags >> wl._BLOCK_SHIFT) & wl._BLOCK_MASK
    nb = od.shape[1] // wl.RB
    per_block = jnp.zeros((nb,), jnp.int32).at[
        jnp.where(valid, blk, nb)].add(1, mode="drop")
    return jnp.sum(valid.astype(jnp.int32)), fits, per_block


tot, fits, pb = jax.block_until_ready(phase_stats(o, d))
pb = np.asarray(pb)
nb = pb.shape[0]
print(f"1M phase items: total={int(tot)} fits={bool(fits)} "
      f"cap_s={wl._capacity(nb, cs)} per-block mean={pb.mean():.1f} "
      f"p90={np.percentile(pb, 90):.0f} max={pb.max()}", flush=True)

# phase timing split
@jax.jit
def phases_only(o, d):
    od, tm, _ = wl._prep_rays_wl(o, d)
    out = wl._phases(arrays, od, tm, False)
    return out[2].sum() + out[3].sum()


t_ph = timed(lambda: float(phases_only(o, d)))
print(f"1M phases A-B: {t_ph*1e3:8.2f} ms "
      f"({NR/t_ph/1e6:6.1f} Mrays/s equiv)", flush=True)

for gg in (False, True):
    wl._GG = gg
    cast_rows(arrays, cfg, o, d, 2, NR, f"1M gg={int(gg)}")
print("done", flush=True)
