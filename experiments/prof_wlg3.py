"""1080p stand-in wavefront steady-state iteration cost with the
grouped pool backend (pallas_wlg, now the TPU default) vs the bundle
pool (pool_backend="pallas_wl"), spp_batch=8 like the headline row."""
import tempfile
import time

import jax
import jax.numpy as jnp

from directcomputeraytracing_tpu.integrator import wavefront as wf
from directcomputeraytracing_tpu.integrator.renderer import Renderer
from directcomputeraytracing_tpu.scene.standin import write_standin_scene
from directcomputeraytracing_tpu.scene.xml_loader import load_mitsuba_xml

with tempfile.TemporaryDirectory() as d:
    xml = write_standin_scene(d)
    scene, settings = load_mitsuba_xml(xml)
cam = settings.camera

for pool_bk in ("", "pallas_wl"):
    r = Renderer(scene, cam, width=1920, height=1080, max_bounce=4,
                 any_hit=True, integrator="wavefront",
                 pool_backend=pool_bk)
    px, py = r._px, r._py
    cfg = r.cfg
    from directcomputeraytracing_tpu.integrator.common import (
        pool_cast_backend,
    )
    print("pool backend:", pool_cast_backend(cfg), flush=True)
    S = 8
    t0 = time.perf_counter()
    state = wf._init_state(r.arrays, r.luts, cam, cfg, px, py,
                           jnp.uint32(0), None, S)
    state, _it = wf._chunk(r.arrays, r.luts, cam, cfg, px, py,
                      jnp.uint32(0), state, None, 4, S)
    state = jax.block_until_ready(state)
    print(f"  compile+4 iters: {time.perf_counter()-t0:.1f}s",
          flush=True)
    for k in range(3):
        t0 = time.perf_counter()
        state, _it = wf._chunk(r.arrays, r.luts, cam, cfg, px, py,
                          jnp.uint32(0), state, None, 8, S)
        float(state.out_val.sum())
        dt = time.perf_counter() - t0
        print(f"  8 iters: {dt:.2f}s  ({dt/8*1e3:.0f} ms/iter)  "
              f"cursor={int(state.cursor)} busy={int(state.busy.sum())}",
              flush=True)
print("done", flush=True)
