"""Pair-sweep economics: on a warmed incoherent standin pool, compare
the per-block union (what the bundle sweep pays: every entered super
costs a full 1024-lane item) against the per-ray truth (what a
pair-expanded sweep would pay: one lane per (ray, super) enter).

Reports, per granularity (super / cluster) and per window cap:
  union/blk   mean supers entered by ANY ray of a block  (item count)
  pairs/ray   mean supers entered per live ray           (pair count)
  occupancy   pairs / (union * RB)  -- the bundle sweep's lane waste
CPU-only (numpy slab math + jax stack walker for ground-truth caps).
"""
import tempfile

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from directcomputeraytracing_tpu.accel.traverse import intersect_closest
from directcomputeraytracing_tpu.accel.worklist import SUPER
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
print("pool", busy.shape[0], "busy", int(busy.sum()), flush=True)

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

cb = np.asarray(arrays.cluster_bbox)
C = cb.shape[0]
cpad = -(-C // SUPER) * SUPER
cb3 = np.concatenate(
    [cb, np.tile(np.asarray([[1., 1., 1., -1., -1., -1., 0., 0.]],
                            np.float32), (cpad - C, 1))],
    axis=0).reshape(-1, SUPER, 8)
sb = np.concatenate([cb3[:, :, 0:3].min(axis=1),
                     cb3[:, :, 3:6].max(axis=1)], axis=1)
NS = sb.shape[0]
print(f"clusters {C}  supers {NS} (SUPER={SUPER})", flush=True)

# park dead lanes like the sorted casts do
o_all = np.where(live[:, None], o_all, 1e9)
tbest_f = np.where(live, np.where(hit, tbest, texp * 1.001), 0.0)
texp_l = np.where(live, texp * 1.001, 0.0)

RBL = 1024
nblocks = o_all.shape[0] // RBL
rng = np.random.default_rng(0)
blocks = [bb for bb in rng.permutation(nblocks)[:48]
          if live[bb * RBL:(bb + 1) * RBL].mean() > 0.25][:16]
print("sampled blocks", len(blocks), flush=True)


def enter_grid(boxes, o, dv, cap):
    """(n_boxes, RBL) bool enter mask under per-ray cap."""
    inv = 1.0 / np.where(np.abs(dv) < 1e-30, 1e-30, dv)
    t_lo = np.full((boxes.shape[0], o.shape[0]), -1e30, np.float32)
    t_hi = np.full((boxes.shape[0], o.shape[0]), 1e30, np.float32)
    for ax in range(3):
        aa = (boxes[:, ax:ax + 1] - o[None, :, ax]) * inv[None, :, ax]
        cc = (boxes[:, 3 + ax:4 + ax] - o[None, :, ax]) * inv[None, :, ax]
        t_lo = np.maximum(t_lo, np.minimum(aa, cc))
        t_hi = np.minimum(t_hi, np.maximum(aa, cc))
    return (t_hi >= t_lo) & (t_hi >= 0.0) & (t_lo < cap[None, :])


for name, boxes in (("super", sb), ("cluster", cb)):
    for frac, capname in ((0.05, "slab.05"), (1e9, "texp"),
                          (-1.0, "best-t")):
        un = pr = oc = 0.0
        for bb in blocks:
            sl = slice(bb * RBL, (bb + 1) * RBL)
            if frac < 0:
                cap = tbest_f[sl]
            else:
                cap = np.minimum(texp_l[sl], diag * frac)
            ent = enter_grid(boxes, o_all[sl], d_all[sl], cap)
            un += ent.any(axis=1).sum()
            pr += ent.sum()
        un /= len(blocks)
        pairs_blk = pr / len(blocks)
        occ = pairs_blk / max(un * RBL, 1)
        print(f"{name:8s} cap={capname:8s} union/blk {un:7.1f}  "
              f"pairs/blk {pairs_blk:9.1f} (/ray {pairs_blk / RBL:6.2f})"
              f"  occupancy {occ:.4f}", flush=True)
print("done", flush=True)
