"""Stage split for the grouped pool cast: phases-only vs full cast,
plus item-count diagnostics."""
import tempfile
import time

import jax
import jax.numpy as jnp

from directcomputeraytracing_tpu.accel import worklist as wl
from directcomputeraytracing_tpu.integrator import wavefront as wf
from directcomputeraytracing_tpu.integrator.renderer import Renderer
from directcomputeraytracing_tpu.scene.standin import write_standin_scene
from directcomputeraytracing_tpu.scene.xml_loader import load_mitsuba_xml

with tempfile.TemporaryDirectory() as d:
    xml = write_standin_scene(d)
    scene, settings = load_mitsuba_xml(xml)
cam = settings.camera
r = Renderer(scene, cam, width=1024, height=576, max_bounce=4,
             any_hit=True, integrator="wavefront")
arrays, cfg = r.arrays, r.cfg
px, py = r._px, r._py
state = wf._init_state(arrays, r.luts, cam, cfg, px, py, jnp.uint32(0),
                       None, 1)
state, _it = wf._chunk(arrays, r.luts, cam, cfg, px, py, jnp.uint32(0),
                  state, None, 6, 1)
state = jax.block_until_ready(state)
busy, o, d = wf._permute_pool(arrays, state.busy, state.ray_o,
                              state.ray_d, ())[:3]
o, d = wf._park(busy, o, d)
o, d = jax.block_until_ready((o, d))
R = o.shape[0]
print(f"pool {R} rays, busy={int(busy.sum())}", flush=True)


def bench(label, fn, reps=4):
    out = fn()
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    best = 1e9
    for _ in range(reps):
        t1 = time.perf_counter()
        out = fn()
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t1)
    print(f"{label:34s} {best*1e3:9.1f} ms", flush=True)
    return best


@jax.jit
def phases_only(o=o, d=d):
    od, tm, _r = wl._prep_rays_wl(o, d)
    outs = wl._phases(arrays, od, tm, False, cap_mult=wl.GROUP_CAPM)
    # blkflags, sup, t_ent, fits
    return (outs[2].sum().astype(jnp.float32) + outs[4].sum()
            + outs[3].astype(jnp.float32).sum())


@jax.jit
def prep_only(o=o, d=d):
    od, tm, _r = wl._prep_rays_wl(o, d)
    return od.sum() + tm.sum()


bench("ray prep", prep_only)
bench("phases (cap 192)", phases_only)

# item-count diagnostics
od, tm, _ = wl._prep_rays_wl(o, d)
tabs, cbox3, blkflags, sup, t_ent, fits, block_any, cap_s = wl._phases(
    arrays, od, tm, False, cap_mult=wl.GROUP_CAPM)
import numpy as np
bf = np.asarray(blkflags)
valid = (bf & 1) == 1
print(f"cap_s={cap_s} items={int(valid.sum())} fits={bool(fits)} "
      f"blocks={od.shape[1]//wl.RB}", flush=True)
print("done", flush=True)
