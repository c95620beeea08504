"""Sort-key scheme sweep: closest-cast cost on a realistic warmed
1080p pool under each coherence key."""
import tempfile
import time

import jax
import jax.numpy as jnp

from directcomputeraytracing_tpu.accel.traverse import intersect_closest
from directcomputeraytracing_tpu.integrator import wavefront as wf
from directcomputeraytracing_tpu.integrator.common import ray_sort_key
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
cfg = r.cfg
S = 8

state = wf._init_state(r.arrays, r.luts, cam, cfg, px, py,
                       jnp.uint32(0), None, S)
t0 = time.perf_counter()
for _ in range(2):
    state, _it = wf._chunk(r.arrays, r.luts, cam, cfg, px, py, jnp.uint32(0),
                      state, None, 4, S)
state = jax.block_until_ready(state)
print(f"warm: {time.perf_counter()-t0:.1f} s "
      f"busy={int(state.busy.sum())}", flush=True)

arrays = r.arrays
busy, ray_o, ray_d, ou = state.busy, state.ray_o, state.ray_d, \
    state.opacity_u
root_lo = arrays.node_bbox_min[0]
inv_ext = 1.0 / jnp.maximum(arrays.node_bbox_max[0] - root_lo, 1e-6)

import functools


@functools.partial(jax.jit, static_argnames=("scheme",))
def sorted_cast(busy, ray_o, ray_d, ou, scheme):
    key = ray_sort_key(ray_o, ray_d, root_lo, inv_ext, scheme=scheme)
    key = jnp.where(busy, key, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key)
    far = jnp.float32(2e9)
    o = jnp.where(busy[:, None], ray_o, far)[order]
    d = jnp.where(busy[:, None], ray_d,
                  jnp.asarray([1.0, 0.0, 0.0], jnp.float32))[order]
    h = intersect_closest(arrays, o, d, cfg.stack_size,
                          backend=cfg.traversal_backend,
                          watertight=cfg.watertight, opacity_u=ou[order],
                          alpha_textures=cfg.any_hit_texture)
    return h.t


for scheme in ("oct_morton12", "oct_dir6_morton12", "oct_morton12_dir6",
               "oct_morton18"):
    fn = lambda: sorted_cast(busy, ray_o, ray_d, ou, scheme)
    fn()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        x = fn()
        float(jnp.asarray(x).reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    print(f"{scheme:22s} closest-alpha {min(ts)*1e3:9.1f} ms",
          flush=True)
print("done", flush=True)
