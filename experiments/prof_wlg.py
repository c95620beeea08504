"""Grouped-sweep (pallas_wlg) A/B: chip correctness vs brute on random
rays, then the WARMED incoherent 1080p pool (the wall from
docs/PERF.md) closest/any vs the bundle path, plus coherent camera
rays.

Usage: python experiments/prof_wlg.py [w h iters]
"""
import sys
import tempfile
import time

import numpy as np
import jax
import jax.numpy as jnp

from directcomputeraytracing_tpu.accel.traverse import (
    intersect_any, intersect_closest,
)
from directcomputeraytracing_tpu.integrator import wavefront as wf
from directcomputeraytracing_tpu.integrator.renderer import Renderer
from directcomputeraytracing_tpu.scene.standin import write_standin_scene
from directcomputeraytracing_tpu.scene.xml_loader import load_mitsuba_xml

w = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
h = int(sys.argv[2]) if len(sys.argv) > 2 else 576
warm = int(sys.argv[3]) if len(sys.argv) > 3 else 6

with tempfile.TemporaryDirectory() as d:
    xml = write_standin_scene(d)
    scene, settings = load_mitsuba_xml(xml)
cam = settings.camera

r = Renderer(scene, cam, width=w, height=h, max_bounce=4, any_hit=True,
             integrator="wavefront")
arrays, cfg = r.arrays, r.cfg

# --- chip correctness: wlg vs brute on random rays -------------------
rng = np.random.default_rng(0)
n = 4096
o_r = rng.uniform(-1, 1, (n, 3)).astype(np.float32) * 3
d_r = rng.normal(size=(n, 3)).astype(np.float32)
d_r /= np.linalg.norm(d_r, axis=1, keepdims=True)
o_r, d_r = jnp.asarray(o_r), jnp.asarray(d_r)
ref = intersect_closest(arrays, o_r, d_r, cfg.stack_size,
                        backend="brute")
g = intersect_closest(arrays, o_r, d_r, cfg.stack_size,
                      backend="pallas_wlg")
mh = int((np.asarray(g.hit) != np.asarray(ref.hit)).sum())
both = np.asarray(g.hit) & np.asarray(ref.hit)
rel = np.abs(np.asarray(g.t)[both] - np.asarray(ref.t)[both])
rel /= np.maximum(np.asarray(ref.t)[both], 1e-6)
mt = int((rel > 1e-3).sum())
ra = intersect_any(arrays, o_r, d_r, jnp.float32(4.0), cfg.stack_size,
                   backend="brute")
ga = intersect_any(arrays, o_r, d_r, jnp.float32(4.0), cfg.stack_size,
                   backend="pallas_wlg")
ma = int((np.asarray(ga) != np.asarray(ra)).sum())
print(f"chip check: hit mism {mh}, t mism {mt}, any mism {ma}, "
      f"hits {int(both.sum())}", flush=True)
assert mh == 0 and mt == 0 and ma == 0

# --- warmed incoherent pool ------------------------------------------
px, py = r._px, r._py
state = wf._init_state(arrays, r.luts, cam, cfg, px, py, jnp.uint32(0),
                       None, 1)
t0 = time.perf_counter()
state, _it = wf._chunk(arrays, r.luts, cam, cfg, px, py, jnp.uint32(0),
                  state, None, warm, 1)
state = jax.block_until_ready(state)
print(f"warmed pool {state.busy.shape[0]} lanes, "
      f"busy={int(state.busy.sum())}, {time.perf_counter()-t0:.1f}s",
      flush=True)

busy, o, d = wf._permute_pool(arrays, state.busy, state.ray_o,
                              state.ray_d, ())[:3]
o, d = wf._park(busy, o, d)
o, d = jax.block_until_ready((o, d))
R = o.shape[0]
dist = jnp.where(busy, jnp.float32(5.0), 0.0)


def bench(label, fn, reps=4):
    out = fn()
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    best = 1e9
    for _ in range(reps):
        t1 = time.perf_counter()
        out = fn()
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t1)
    print(f"{label:28s} {best*1e3:9.1f} ms  "
          f"{R/best/1e6:7.2f} Mrays/s", flush=True)
    return best


for bk in ("pallas_wl", "pallas_wlg"):
    @jax.jit
    def cl(o=o, d=d, bk=bk):
        return intersect_closest(arrays, o, d, cfg.stack_size,
                                 backend=bk).t.sum()

    @jax.jit
    def an(o=o, d=d, bk=bk):
        return intersect_any(arrays, o, d, dist, cfg.stack_size,
                             backend=bk).sum().astype(jnp.float32)

    bench(f"pool closest {bk}", cl)
    bench(f"pool any     {bk}", an)

# pool exactness: wlg vs wl on the warmed pool rays
c_wl = intersect_closest(arrays, o, d, cfg.stack_size,
                         backend="pallas_wl")
c_g = intersect_closest(arrays, o, d, cfg.stack_size,
                        backend="pallas_wlg")
mh = int((np.asarray(c_g.hit) != np.asarray(c_wl.hit)).sum())
both = np.asarray(c_g.hit) & np.asarray(c_wl.hit)
dt = np.abs(np.asarray(c_g.t)[both] - np.asarray(c_wl.t)[both])
print(f"pool exactness: hit mism {mh}, max |dt| {dt.max():.2e}",
      flush=True)

# --- coherent camera rays (212k scene view, 4M tile-ordered) ---------
from directcomputeraytracing_tpu.camera.camera import generate_ray
from directcomputeraytracing_tpu.integrator.megakernel import (
    tiled_frame_pixels,
)
from directcomputeraytracing_tpu.rng.xoshiro import (
    init_rng, next_sample_2d, next_sample_3d,
)
from directcomputeraytracing_tpu.integrator.common import RenderConfig

wc = hc = 2048
cfg2 = RenderConfig(width=wc, height=hc, max_bounce=1,
                    stack_size=cfg.stack_size, light_count=0)
pxc, pyc, _ = tiled_frame_pixels(cfg2)


@jax.jit
def make_rays(seed):
    rngs = init_rng(pxc, pyc, seed)
    rngs, jitter = next_sample_2d(rngs)
    res = jnp.asarray([wc, hc], jnp.float32)
    pix = jnp.stack([pxc, pyc], -1).astype(jnp.float32)
    rngs, ap = next_sample_3d(rngs)
    return generate_ray(cam, (jitter + pix) / res, ap)


oc, dc = jax.block_until_ready(make_rays(jnp.uint32(0)))
Rc = oc.shape[0]
for bk in ("pallas_wl", "pallas_wlg"):
    @jax.jit
    def clc(o=oc, d=dc, bk=bk):
        return intersect_closest(arrays, o, d, cfg.stack_size,
                                 backend=bk).t.sum()
    outb = clc(); float(outb)
    best = 1e9
    for _ in range(3):
        t1 = time.perf_counter()
        float(clc())
        best = min(best, time.perf_counter() - t1)
    print(f"camera closest {bk:12s} {best*1e3:9.1f} ms  "
          f"{Rc/best/1e6:7.2f} Mrays/s", flush=True)
print("done", flush=True)
