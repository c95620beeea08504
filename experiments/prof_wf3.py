"""1080p standin wavefront with spp_batch: the coherence lever.
Measures wall/spp at S=8 (and the chunk profile)."""
import sys
import tempfile
import time

import jax
import jax.numpy as jnp

from directcomputeraytracing_tpu.integrator import wavefront as wf
from directcomputeraytracing_tpu.integrator.renderer import Renderer
from directcomputeraytracing_tpu.scene.standin import write_standin_scene
from directcomputeraytracing_tpu.scene.xml_loader import load_mitsuba_xml

S = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ipd = int(sys.argv[2]) if len(sys.argv) > 2 else 8
pool = int(sys.argv[3]) if len(sys.argv) > 3 else 0
pool = pool if pool else None
slab = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
max_chunks = int(sys.argv[5]) if len(sys.argv) > 5 else 0   # 0 = drain
pool_bk = sys.argv[6] if len(sys.argv) > 6 else ""  # e.g. pallas_pair

with tempfile.TemporaryDirectory() as d:
    xml = write_standin_scene(d)
    scene, settings = load_mitsuba_xml(xml)
cam = settings.camera

r = Renderer(scene, cam, width=1920, height=1080, max_bounce=4,
             any_hit=True, integrator="wavefront", slab_march=slab,
             pool_backend=pool_bk)
px, py = r._px, r._py
R = px.shape[0]
RT = R * S
cfg = r.cfg

state = wf._init_state(r.arrays, r.luts, cam, cfg, px, py,
                       jnp.uint32(0), pool, S)
print(f"S={S} ipd={ipd} pool={state.busy.shape[0]} RT={RT} "
      f"slab={slab} pool_bk={pool_bk!r}", flush=True)
it, t_all, t0c, nch = 0, time.perf_counter(), None, 0
while True:
    t0 = time.perf_counter()
    state, _it = wf._chunk(r.arrays, r.luts, cam, cfg, px, py, jnp.uint32(0),
                      state, pool, ipd, S)
    state = jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    if t0c is None:
        t0c = dt
    it += ipd
    nch += 1
    cur, bs = int(state.cursor), int(state.busy.sum())
    print(f"it{it:4d}: {dt:6.1f} s/chunk cursor={cur}/{RT} busy={bs}",
          flush=True)
    if not (cur < RT or bs):
        break
    if it > 1400 or (max_chunks and nch >= max_chunks):
        print("BAIL")
        break
tot = time.perf_counter() - t_all
print(f"S={S}: {it} iters, {tot:.1f} s total, "
      f"{(tot - t0c) / max(it - ipd, 1) * 1e3:.0f} ms/iter steady, "
      f"{tot / S * 1e3:.0f} ms/spp incl compile", flush=True)
print("done", flush=True)
