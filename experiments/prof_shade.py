"""Decompose the wavefront iteration's RESIDUAL (2.5 s of a 3.3 s
1080p iteration, prof_wfsplit.py): shade_hit attribute gathers, light
NEE, BSDF dispatch, refill — each standalone-jitted on chip at pool
size (262144 lanes) with realistic random indices."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from directcomputeraytracing_tpu.bsdf.dispatch import (
    evaluate_bsdf, evaluate_bsdf_pdf, sample_bsdf,
)
from directcomputeraytracing_tpu.accel.traverse import HitInfo
from directcomputeraytracing_tpu.integrator.common import (
    RenderConfig, shade_hit,
)
from directcomputeraytracing_tpu.lights.lights import (
    evaluate_light_direct, sample_light_direct,
)
from directcomputeraytracing_tpu.lut.bake import bake_luts_cached
from directcomputeraytracing_tpu.rng.xoshiro import (
    init_rng, next_sample_2d, next_sample_3d,
)
from directcomputeraytracing_tpu.camera.camera import generate_ray
from directcomputeraytracing_tpu.scene.standin import write_standin_scene
from directcomputeraytracing_tpu.scene.xml_loader import load_mitsuba_xml
from directcomputeraytracing_tpu.scene.scene import flatten_scene

import tempfile

with tempfile.TemporaryDirectory() as d:
    xml = write_standin_scene(d)
    scene_h, settings = load_mitsuba_xml(xml)
arrays, meta = flatten_scene(scene_h)
cam = settings.camera
luts = bake_luts_cached()
cfg = RenderConfig(width=1920, height=1080, max_bounce=4,
                   stack_size=meta.stack_size,
                   light_count=meta.light_count, any_hit=True)

P = 1 << 18
rng = np.random.default_rng(0)
NT = arrays.triangles.shape[0]
tri = jnp.asarray(rng.integers(0, NT, P, dtype=np.int32))
inst = jnp.asarray(rng.integers(
    0, max(int(arrays.instance_transforms.shape[0]), 1), P,
    dtype=np.int32))
u = jnp.asarray(rng.uniform(0, 0.5, P).astype(np.float32))
v = jnp.asarray(rng.uniform(0, 0.5, P).astype(np.float32))
t = jnp.asarray(rng.uniform(0.5, 10.0, P).astype(np.float32))
o = jnp.asarray(rng.uniform(-3, 3, (P, 3)).astype(np.float32))
dd = rng.normal(size=(P, 3)).astype(np.float32)
dd /= np.linalg.norm(dd, axis=1, keepdims=True)
d_ = jnp.asarray(dd)
hit = HitInfo(t=t, u=u, v=v, triangle=tri, instance=inst,
              backface=jnp.zeros(P, bool), hit=jnp.ones(P, bool),
              iterations=jnp.zeros(P, jnp.int32))


def bench(label, fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
          .astype(np.float32))
    best = 1e9
    for _ in range(reps):
        t1 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
              .astype(np.float32))
        best = min(best, time.perf_counter() - t1)
    print(f"{label:40s} {best*1e3:9.1f} ms", flush=True)
    return best


@jax.jit
def f_shade():
    itx = shade_hit(arrays, o, d_, hit)
    return itx.position.sum() + itx.normal.sum() + itx.albedo.sum()


itx = jax.block_until_ready(shade_hit(arrays, o, d_, hit))


@jax.jit
def f_eval_light():
    rad, pdf = evaluate_light_direct(
        arrays, max(cfg.light_count, 1), cfg.has_env_texture,
        itx.light_index, itx.triangle_index, itx.geometry_normal, d_,
        t)
    return rad.sum() + pdf.sum()


@jax.jit
def f_sample_light():
    ls = sample_light_direct(arrays, cfg.light_count,
                             cfg.has_env_texture, itx.position,
                             u, v, jnp.stack([u, v], -1))
    return ls.wi.sum() + ls.radiance.sum()


@jax.jit
def f_bsdf():
    f1 = evaluate_bsdf(luts, d_, -d_, itx, cfg.use_vndf)
    p1 = evaluate_bsdf_pdf(luts, d_, -d_, itx, cfg.use_vndf)
    wi, f2, pdf, isd = sample_bsdf(luts, -d_, jnp.stack([u, v], -1),
                                   u, itx, cfg.use_vndf)
    return f1.sum() + p1.sum() + wi.sum() + f2.sum() + pdf.sum()


@jax.jit
def f_refill():
    px = jnp.arange(P, dtype=jnp.uint32) % 1920
    py = jnp.arange(P, dtype=jnp.uint32) % 1080
    r0 = init_rng(px, py, jnp.uint32(3))
    r0, ps = next_sample_2d(r0)
    r0, ap = next_sample_3d(r0)
    res = jnp.asarray([1920.0, 1080.0], jnp.float32)
    pix = jnp.stack([px, py], -1).astype(jnp.float32)
    co, cd = generate_ray(cam, (ps + pix) / res, ap)
    return co.sum() + cd.sum()


@jax.jit
def f_opacity():
    from directcomputeraytracing_tpu.accel.traverse import (
        effective_opacity,
    )
    opac, opaque = effective_opacity(arrays, tri, inst, u, v, True)
    return opac.sum() + opaque.sum().astype(jnp.float32)


bench("shade_hit (4 big gathers + math)", f_shade)
bench("evaluate_light_direct", f_eval_light)
bench("sample_light_direct", f_sample_light)
bench("bsdf eval+pdf+sample (5-type dispatch)", f_bsdf)
bench("refill (rng + camera rays)", f_refill)
bench("effective_opacity (alpha fetch)", f_opacity)
