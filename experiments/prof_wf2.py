"""Post-fix wavefront timings at 1080p standin: (1) step cost with
parked idle lanes + compacted alpha recast, (2) stack-walker closest
on pool rays (per-ray adaptivity vs bundle sweeps on incoherent rays),
(3) pool-size coherence sweep (smaller pool = tighter pixel window)."""
import tempfile
import time

import jax
import jax.numpy as jnp

from directcomputeraytracing_tpu.accel.traverse import intersect_closest
from directcomputeraytracing_tpu.integrator import wavefront as wf
from directcomputeraytracing_tpu.integrator.renderer import Renderer
from directcomputeraytracing_tpu.scene.standin import write_standin_scene
from directcomputeraytracing_tpu.scene.xml_loader import load_mitsuba_xml

with tempfile.TemporaryDirectory() as d:
    xml = write_standin_scene(d)
    scene, settings = load_mitsuba_xml(xml)
cam = settings.camera

r = Renderer(scene, cam, width=1920, height=1080, max_bounce=4,
             any_hit=True, integrator="wavefront")
px, py = r._px, r._py
R = px.shape[0]
cfg = r.cfg

state = wf._init_state(r.arrays, r.luts, cam, cfg, px, py, jnp.uint32(0))
for k in range(2):
    t0 = time.perf_counter()
    state, _it = wf._chunk(r.arrays, r.luts, cam, cfg, px, py, jnp.uint32(0),
                      state, None, 4)
    state = jax.block_until_ready(state)
    print(f"warm chunk {k} (4 it): {time.perf_counter()-t0:6.1f} s  "
          f"busy={int(state.busy.sum())}", flush=True)
for k in range(2):
    t0 = time.perf_counter()
    state, _it = wf._chunk(r.arrays, r.luts, cam, cfg, px, py, jnp.uint32(0),
                      state, None, 4)
    state = jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    print(f"steady chunk (4 it): {dt:6.1f} s = {dt/4*1e3:7.0f} ms/iter",
          flush=True)

# stack walker on the same pool rays (sorted, parked)
from directcomputeraytracing_tpu.integrator.common import ray_sort_key

busy, ray_o, ray_d, ou = state.busy, state.ray_o, state.ray_d, \
    state.opacity_u
arrays = r.arrays
root_lo = arrays.node_bbox_min[0]
inv_ext = 1.0 / jnp.maximum(arrays.node_bbox_max[0] - root_lo, 1e-6)


@jax.jit
def sortpark(busy, ray_o, ray_d, ou):
    key = ray_sort_key(ray_o, ray_d, root_lo, inv_ext)
    key = jnp.where(busy, key, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key)
    far = jnp.float32(2e9)
    o = jnp.where(busy[:, None], ray_o, far)[order]
    d = jnp.where(busy[:, None], ray_d,
                  jnp.asarray([1.0, 0.0, 0.0], jnp.float32))[order]
    return o, d, ou[order]


o_s, d_s, ou_s = jax.block_until_ready(sortpark(busy, ray_o, ray_d, ou))


def bench(label, fn, n=3):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        x = fn()
        float(jnp.asarray(x).reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    print(f"{label:44s} {min(ts)*1e3:9.1f} ms", flush=True)


@jax.jit
def closest_alpha_wl(o, d, u):
    return intersect_closest(arrays, o, d, cfg.stack_size,
                             backend=cfg.traversal_backend,
                             watertight=cfg.watertight, opacity_u=u,
                             alpha_textures=cfg.any_hit_texture).t


bench("closest alpha WL (parked+compacted)",
      lambda: closest_alpha_wl(o_s, d_s, ou_s))


@jax.jit
def closest_alpha_stack(o, d, u):
    return intersect_closest(arrays, o, d, 64, backend="jax",
                             watertight=cfg.watertight, opacity_u=u,
                             alpha_textures=cfg.any_hit_texture).t


bench("closest alpha STACK walker",
      lambda: closest_alpha_stack(o_s, d_s, ou_s))

# pool-size sweep: drain a full sample at 65536
for pool in (65536,):
    st = wf._init_state(r.arrays, r.luts, cam, cfg, px, py,
                        jnp.uint32(0), pool_size=pool)
    it, t_all, t0c = 0, time.perf_counter(), None
    while True:
        t0 = time.perf_counter()
        st, _it = wf._chunk(r.arrays, r.luts, cam, cfg, px, py,
                       jnp.uint32(0), st, pool, 8)
        st = jax.block_until_ready(st)
        if t0c is None:
            t0c = time.perf_counter() - t0  # compile chunk
        it += 8
        cur, bs = int(st.cursor), int(st.busy.sum())
        if it % 32 == 0 or not (cur < R or bs):
            print(f"pool{pool} it{it:4d}: {time.perf_counter()-t0:6.1f}"
                  f" s/chunk cursor={cur} busy={bs}", flush=True)
        if not (cur < R or bs):
            break
        if it > 640:
            print("BAIL")
            break
    tot = time.perf_counter() - t_all
    print(f"pool{pool}: {it} iters, {tot:.1f} s total "
          f"(first-chunk/compile {t0c:.1f} s)", flush=True)
print("done", flush=True)
