"""Lane-group sparsity census for a would-be sparse sweep kernel.

For sorted bounce-ray bundles: of the clusters a 1024-ray bundle
enters (its sweep work list), how many 128-lane groups does each
entered cluster actually need? If the answer is ~1-2, a group-masked
sweep variant cuts incoherent-cast cost ~4x; if ~6-8, it cannot.

CPU-only: builds a reduced-res standin pool through the wavefront
machinery, then does the slab math in numpy.
"""
import tempfile

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
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

W, H = 512, 288
r = Renderer(scene, cam, width=W, height=H, max_bounce=4, any_hit=True,
             integrator="wavefront")
px, py = r._px, r._py
cfg = r.cfg
S = 8
state = wf._init_state(r.arrays, r.luts, cam, cfg, px, py,
                       jnp.uint32(0), None, S)
for _ in range(6):
    state, _it = wf._chunk(r.arrays, r.luts, cam, cfg, px, py, jnp.uint32(0),
                      state, None, 1, S)
busy = np.asarray(state.busy)
print("pool", busy.shape[0], "busy", busy.sum(), flush=True)

arrays = r.arrays
root_lo = arrays.node_bbox_min[0]
inv_ext = 1.0 / jnp.maximum(arrays.node_bbox_max[0] - root_lo, 1e-6)
key = np.asarray(ray_sort_key(state.ray_o, state.ray_d, root_lo,
                              inv_ext))
key = np.where(busy, key, 0xFFFFFFFF)
order = np.argsort(key, kind="stable")
o = np.asarray(state.ray_o)[order]
dvec = np.asarray(state.ray_d)[order]
live = busy[order]

# per-ray final best t from the real traversal (enter prune bound)
h = intersect_closest(arrays, jnp.asarray(o), jnp.asarray(dvec),
                      cfg.stack_size, backend="jax")
tbest = np.asarray(h.t)
tbest = np.where(np.isfinite(tbest), tbest, 1e9)
tbest = np.where(live, tbest, 0.0)

cb = np.asarray(arrays.cluster_bbox)          # (C, 8)
lo, hi = cb[:, 0:3], cb[:, 3:6]
C = cb.shape[0]
print("clusters", C, flush=True)

RBL, G = 1024, 128
nblocks = o.shape[0] // RBL
rng = np.random.default_rng(0)
sample = [b for b in rng.permutation(nblocks)[:24]
          if live[b * RBL: (b + 1) * RBL].mean() > 0.5]
stats = []
for b in sample[:10]:
    sl = slice(b * RBL, (b + 1) * RBL)
    ob, db, tb = o[sl], dvec[sl], tbest[sl]
    inv = 1.0 / np.where(np.abs(db) < 1e-30, 1e-30, db)
    # (C, RBL) slab test
    t_lo = np.full((C, RBL), -1e30, np.float32)
    t_hi = np.full((C, RBL), 1e30, np.float32)
    for ax in range(3):
        a = (lo[:, ax:ax + 1] - ob[None, :, ax]) * inv[None, :, ax]
        c2 = (hi[:, ax:ax + 1] - ob[None, :, ax]) * inv[None, :, ax]
        t_lo = np.maximum(t_lo, np.minimum(a, c2))
        t_hi = np.minimum(t_hi, np.maximum(a, c2))
    enter = (t_hi >= t_lo) & (t_hi >= 0.0) & (t_lo < tb[None, :])
    entered = enter.any(axis=1)
    ne = int(entered.sum())
    rays_per = enter[entered].sum(axis=1)
    grp = enter[entered].reshape(ne, RBL // G, G).any(axis=2).sum(axis=1)
    stats.append((ne, rays_per.mean(), grp.mean(),
                  np.percentile(grp, 90)))
    print(f"block {b:4d}: entered {ne:5d}/{C} clusters, "
          f"rays/cluster {rays_per.mean():6.1f}, "
          f"groups/cluster mean {grp.mean():4.2f} p90 "
          f"{np.percentile(grp, 90):4.1f}", flush=True)
a = np.array([s[:3] for s in stats])
print(f"AVG entered {a[:,0].mean():.0f} rays/cl {a[:,1].mean():.1f} "
      f"groups/cl {a[:,2].mean():.2f}", flush=True)
print("done", flush=True)
