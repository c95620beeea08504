"""Per-cast A/B on a WARMED incoherent pool: bundle (pallas_wl) vs
pair-expanded (pallas_pair) closest/any, plus the pair pipeline's
stage costs (emission+layout glue vs sweep) — the deciding
measurement for whether the pool casts should ride the pair path.

Usage: python experiments/prof_paircast.py [w h iters]
"""
import sys
import tempfile
import time

import jax
import jax.numpy as jnp

from directcomputeraytracing_tpu.accel import pairsweep as ps
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

# coherent-permuted pool rays, exactly as _pool_closest sees them
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


# pallas_pair silently resolves to pallas_wl for instanced/tiny scenes
# (traverse._resolve_backend) — make sure this A/B compares what it
# claims to compare
from directcomputeraytracing_tpu.accel import pairsweep
assert not pairsweep._instanced(arrays), \
    "scene flattened to instanced tables; pallas_pair would be rewritten"

for bk in ("pallas_wl", "pallas_pair"):
    @jax.jit
    def cl(o=o, d=d, bk=bk):
        return intersect_closest(arrays, o, d, cfg.stack_size,
                                 backend=bk).t.sum()

    @jax.jit
    def an(o=o, d=d, bk=bk):
        return intersect_any(arrays, o, d, dist, cfg.stack_size,
                             backend=bk).sum().astype(jnp.float32)

    bench(f"closest {bk}", cl)
    bench(f"any     {bk}", an)

# pair pipeline stage split: glue (phases+emission+layout+prt) alone
@jax.jit
def glue_only(o=o, d=d):
    outs = ps._pair_prep(arrays, o, d, 0.0, None, False)
    # touch every glue output that feeds the sweep
    return (outs[16].astype(jnp.float32).sum()  # sup_pb
            + outs[17].sum()                    # prt
            + outs[13].astype(jnp.float32).sum())  # eb


bench("pair glue (prep..prt)", glue_only)
print("done", flush=True)
