"""Slab-march economics: would capping the closest cast at distance D
(then re-casting the compacted unresolved remainder) cut incoherent-pool
sweep cost?

For a warmed reduced-res standin pool: per-ray hit distance
distribution, and a per-block cluster-sweep cost proxy for
  single:  entered clusters under the final-t prune upper bound
           (t_lo < texp union) -- what the dense sweep pays today
  slab:    pass1 = entered under cap min(D, texp), on today's blocks
           pass2 = entered under final best-t, on blocks re-formed by
           compacting + re-sorting only the unresolved rays
CPU-only (numpy slab math + jax stack walker for ground-truth t).
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
root_hi = arrays.node_bbox_max[0]
diag = float(np.linalg.norm(np.asarray(root_hi - root_lo)))
inv_ext = 1.0 / jnp.maximum(root_hi - root_lo, 1e-6)
key = np.asarray(ray_sort_key(state.ray_o, state.ray_d, root_lo,
                              inv_ext))
key = np.where(busy, key, 0xFFFFFFFF)
order = np.argsort(key, kind="stable")
o_all = np.asarray(state.ray_o)[order]
d_all = np.asarray(state.ray_d)[order]
live = busy[order]

# ground-truth best t (stack walker) + scene exit per ray
h = intersect_closest(arrays, jnp.asarray(o_all), jnp.asarray(d_all),
                      cfg.stack_size, backend="jax")
tbest = np.asarray(h.t)
hit = np.isfinite(tbest)

lo_s = np.asarray(root_lo)
hi_s = np.asarray(root_hi)
inv_all = 1.0 / np.where(np.abs(d_all) < 1e-30, 1e-30, d_all)
a = (lo_s[None, :] - o_all) * inv_all
b = (hi_s[None, :] - o_all) * inv_all
t_en = np.minimum(a, b).max(axis=1)
texp = np.maximum(a, b).min(axis=1)
texp = np.where((texp >= t_en) & (texp >= 0), texp, 0.0)

lt = tbest[live & hit] / diag
print(f"diag {diag:.2f}; live {live.sum()}  hit-rate "
      f"{hit[live].mean():.3f}", flush=True)
print("hit t/diag percentiles:",
      {p: round(float(np.percentile(lt, p)), 4)
       for p in (10, 25, 50, 75, 90, 95, 99)}, flush=True)

cb = np.asarray(arrays.cluster_bbox)
clo, chi = cb[:, 0:3], cb[:, 3:6]
C = cb.shape[0]

tbest_f = np.where(live, np.where(hit, tbest, texp * 1.001), 0.0)
texp_l = np.where(live, texp * 1.001, 0.0)

RBL = 1024
nblocks = o_all.shape[0] // RBL
rng = np.random.default_rng(0)
blocks = [bb for bb in rng.permutation(nblocks)[:40]
          if live[bb * RBL:(bb + 1) * RBL].mean() > 0.5][:12]


def entered_count(o, dv, cap):
    """clusters entered by any ray of the block under per-ray cap."""
    inv = 1.0 / np.where(np.abs(dv) < 1e-30, 1e-30, dv)
    t_lo = np.full((C, o.shape[0]), -1e30, np.float32)
    t_hi = np.full((C, o.shape[0]), 1e30, np.float32)
    for ax in range(3):
        aa = (clo[:, ax:ax + 1] - o[None, :, ax]) * inv[None, :, ax]
        cc = (chi[:, ax:ax + 1] - o[None, :, ax]) * inv[None, :, ax]
        t_lo = np.maximum(t_lo, np.minimum(aa, cc))
        t_hi = np.minimum(t_hi, np.maximum(aa, cc))
    ent = (t_hi >= t_lo) & (t_hi >= 0.0) & (t_lo < cap[None, :])
    return int(ent.any(axis=1).sum())

for frac in (0.05, 0.1, 0.2, 0.4, 1e9):
    D = diag * frac
    # pass-1 upper bound: capped enter on today's blocks
    p1 = 0
    for bb in blocks:
        sl = slice(bb * RBL, (bb + 1) * RBL)
        cap = np.minimum(texp_l[sl], D)
        p1 += entered_count(o_all[sl], d_all[sl], cap)
    p1 /= len(blocks)
    # unresolved set: live rays whose answer lies beyond D
    unres = live & (np.where(hit, tbest, texp) >= D)
    fr_un = unres[live].mean() if live.sum() else 0.0
    # pass-2: compact unresolved rays (already key-sorted) into fresh
    # blocks; final best-t prune bound
    o2 = o_all[unres]
    d2 = d_all[unres]
    c2 = tbest_f[unres]
    nb2 = len(o2) // RBL
    p2 = 0.0
    if nb2 > 0:
        pick = rng.permutation(nb2)[:8]
        vals = [entered_count(o2[k * RBL:(k + 1) * RBL],
                              d2[k * RBL:(k + 1) * RBL],
                              c2[k * RBL:(k + 1) * RBL])
                for k in pick]
        p2 = float(np.mean(vals))
    # per-live-block cost proxy: pass1 everywhere + pass2 on the
    # unresolved-compacted block count (scaled per original block)
    total = p1 + p2 * fr_un
    print(f"D={frac:>5}: pass1/blk {p1:7.1f}  unresolved {fr_un:.3f} "
          f"pass2/blk {p2:7.1f}  total-proxy {total:8.1f}", flush=True)
print("done", flush=True)
