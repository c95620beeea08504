"""Piecewise timing of one 1080p standin wavefront iteration: where do
the ~3.2 s/iteration go?  Pieces: sort, closest cast (opaque), closest
cast (alpha recast), any cast (alpha), scatters, full step."""
import tempfile
import time

import jax
import jax.numpy as jnp

from directcomputeraytracing_tpu.accel.traverse import (
    intersect_any,
    intersect_closest,
)
from directcomputeraytracing_tpu.integrator import wavefront as wf
from directcomputeraytracing_tpu.integrator.renderer import Renderer
from directcomputeraytracing_tpu.scene.standin import write_standin_scene
from directcomputeraytracing_tpu.scene.xml_loader import load_mitsuba_xml


def bench(label, fn, n=3):
    fn()  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        jax.block_until_ready(r)
        # force a host readback (tunnel under-reports block_until_ready)
        jax.tree_util.tree_map(
            lambda x: float(jnp.asarray(x).reshape(-1)[0].astype(jnp.float32))
            if hasattr(x, "reshape") else x, r)
        ts.append(time.perf_counter() - t0)
    print(f"{label:42s} {min(ts)*1e3:9.1f} ms", flush=True)
    return r


with tempfile.TemporaryDirectory() as d:
    xml = write_standin_scene(d)
    scene, settings = load_mitsuba_xml(xml)
cam = settings.camera

r = Renderer(scene, cam, width=1920, height=1080, max_bounce=4,
             any_hit=True, integrator="wavefront")
px, py = r._px, r._py
R = px.shape[0]
cfg = r.cfg
print("any_hit_texture:", cfg.any_hit_texture, " backend:",
      cfg.traversal_backend, " sort:", cfg.sort_bounce_rays, flush=True)

t0 = time.perf_counter()
state = wf._init_state(r.arrays, r.luts, cam, cfg, px, py, jnp.uint32(0))
state = jax.block_until_ready(state)
print(f"init: {time.perf_counter()-t0:.1f} s", flush=True)
# warm the pool past the primary wave into a realistic bounce mix
# (ipd=4 matches the prof_1080b compile-cache signature)
for k in range(2):
    t0 = time.perf_counter()
    state, _it = wf._chunk(r.arrays, r.luts, cam, cfg, px, py, jnp.uint32(0),
                      state, None, 4)
    state = jax.block_until_ready(state)
    print(f"warmup chunk {k}: {time.perf_counter()-t0:.1f} s "
          f"busy={int(state.busy.sum())}", flush=True)

busy, ray_o, ray_d, ou = state.busy, state.ray_o, state.ray_d, \
    state.opacity_u
arrays = r.arrays

from directcomputeraytracing_tpu.integrator.common import ray_sort_key

root_lo = arrays.node_bbox_min[0]
root_hi = arrays.node_bbox_max[0]
inv_ext = 1.0 / jnp.maximum(root_hi - root_lo, 1e-6)


@jax.jit
def sort_only(busy, ray_o, ray_d):
    key = ray_sort_key(ray_o, ray_d, root_lo, inv_ext)
    key = jnp.where(busy, key, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key)
    return ray_o[order], ray_d[order], order


o_s, d_s, order = bench("sort+gather", lambda: sort_only(busy, ray_o,
                                                         ray_d))
ou_s = ou[order]


@jax.jit
def closest_opaque(o, d):
    h = intersect_closest(arrays, o, d, cfg.stack_size,
                          backend=cfg.traversal_backend,
                          watertight=cfg.watertight)
    return h.t


bench("closest cast sorted, NO alpha", lambda: closest_opaque(o_s, d_s))


@jax.jit
def closest_alpha(o, d, u):
    h = intersect_closest(arrays, o, d, cfg.stack_size,
                          backend=cfg.traversal_backend,
                          watertight=cfg.watertight, opacity_u=u,
                          alpha_textures=cfg.any_hit_texture)
    return h.t


bench("closest cast sorted, alpha recast", lambda: closest_alpha(
    o_s, d_s, ou_s))


@jax.jit
def any_alpha(o, d, u):
    return intersect_any(arrays, o, d, jnp.full(o.shape[0], 20.0), cfg.
                         stack_size, backend=cfg.traversal_backend,
                         watertight=cfg.watertight, opacity_u=u,
                         alpha_textures=cfg.any_hit_texture)


bench("any cast sorted, alpha recast", lambda: any_alpha(o_s, d_s, ou_s))


@jax.jit
def any_opaque(o, d):
    return intersect_any(arrays, o, d, jnp.full(o.shape[0], 20.0),
                         cfg.stack_size, backend=cfg.traversal_backend,
                         watertight=cfg.watertight)


bench("any cast sorted, NO alpha", lambda: any_opaque(o_s, d_s))

P = busy.shape[0]


@jax.jit
def scatters(state):
    pidx = jnp.clip(state.pixel, 0, R - 1)
    fin = state.busy
    ov = state.out_val.at[jnp.where(fin, pidx, R)].add(
        jnp.where(fin[:, None], state.li, 0.0), mode="drop")
    op = state.out_pos.at[jnp.where(fin, pidx, R)].set(
        jnp.zeros((P, 2)), mode="drop")
    return ov, op


bench("film scatters", lambda: scatters(state))

bench("full step (chunk ipd=1)", lambda: wf._chunk(
    r.arrays, r.luts, cam, cfg, px, py, jnp.uint32(0), state, None, 1))

# alpha depth census: how many recast passes would this pool need?
h0 = jax.jit(lambda o, d: intersect_closest(
    arrays, o, d, cfg.stack_size, backend=cfg.traversal_backend,
    watertight=cfg.watertight))(o_s, d_s)
from directcomputeraytracing_tpu.accel.traverse import effective_opacity
op, opq = jax.jit(lambda h: effective_opacity(
    arrays, h.triangle, h.instance, h.u, h.v, cfg.any_hit_texture))(h0)
rej = (~opq) & (ou_s >= op) & jnp.isfinite(h0.t)
print("busy:", int(busy.sum()), " hits:", int(jnp.isfinite(h0.t).sum()),
      " first-pass rejects:", int(rej.sum()), flush=True)
print("done", flush=True)
