"""Pair-sweep trip census: for pair-blocks (1024 pairs of ONE super,
rays gathered across the pool), how many 16-tri clusters does the
nearest-first loop sweep? Upper bound = union of the lanes' entered
clusters within the super. Decides whether SUPER=32 pair granularity
leaves the in-item trip loop as the next wall (vs finer pair groups).

CPU-only; reuses the warmed standin pool from pair_econ.
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
o_all = np.where(live[:, None], o_all, 1e9)

h = intersect_closest(arrays, jnp.asarray(o_all), jnp.asarray(d_all),
                      cfg.stack_size, backend="jax")
tbest = np.asarray(h.t)
hit = np.isfinite(tbest)
a = (np.asarray(root_lo)[None] - o_all)
inv_all = 1.0 / np.where(np.abs(d_all) < 1e-30, 1e-30, d_all)
aa = a * inv_all
bb = (np.asarray(root_hi)[None] - o_all) * inv_all
t_en = np.minimum(aa, bb).max(axis=1)
texp = np.maximum(aa, bb).min(axis=1)
texp = np.where((texp >= t_en) & (texp >= 0), texp, 0.0)
cap = np.where(live, np.where(hit, tbest, texp * 1.001), 0.0)

cb = np.asarray(arrays.cluster_bbox)
C = cb.shape[0]
cpad = -(-C // SUPER) * SUPER
cb_p = np.concatenate(
    [cb, np.tile(np.asarray([[1., 1., 1., -1., -1., -1., 0., 0.]],
                            np.float32), (cpad - C, 1))], axis=0)
cb3 = cb_p.reshape(-1, SUPER, 8)
sb = np.concatenate([cb3[:, :, 0:3].min(axis=1),
                     cb3[:, :, 3:6].max(axis=1)], axis=1)
NS = sb.shape[0]
print(f"clusters {C} supers {NS}", flush=True)


def enter(boxes, o, dv, capr):
    inv = 1.0 / np.where(np.abs(dv) < 1e-30, 1e-30, dv)
    t_lo = np.full((boxes.shape[0], o.shape[0]), -1e30, np.float32)
    t_hi = np.full((boxes.shape[0], o.shape[0]), 1e30, np.float32)
    for ax in range(3):
        x = (boxes[:, ax:ax + 1] - o[None, :, ax]) * inv[None, :, ax]
        y = (boxes[:, 3 + ax:4 + ax] - o[None, :, ax]) * inv[None, :, ax]
        t_lo = np.maximum(t_lo, np.minimum(x, y))
        t_hi = np.minimum(t_hi, np.maximum(x, y))
    return (t_hi >= t_lo) & (t_hi >= 0.0) & (t_lo < capr[None, :])

# build the global pair list on a 64-block sample: (ray, super) pairs
rng = np.random.default_rng(0)
nblocks = o_all.shape[0] // 1024
bsel = [b for b in rng.permutation(nblocks)
        if live[b * 1024:(b + 1) * 1024].mean() > 0.25][:64]
pairs_r, pairs_s = [], []
for b in bsel:
    sl = slice(b * 1024, (b + 1) * 1024)
    es = enter(sb, o_all[sl], d_all[sl], cap[sl])      # (NS, 1024)
    s_idx, l_idx = np.nonzero(es)
    pairs_r.append(b * 1024 + l_idx)
    pairs_s.append(s_idx)
pairs_r = np.concatenate(pairs_r)
pairs_s = np.concatenate(pairs_s)
print("pairs", len(pairs_r), "rays", 64 * 1024, flush=True)

# group pairs by super, chunk into 1024-lane pair-blocks, measure the
# in-item union of entered clusters (the trip-loop bound)
orderp = np.argsort(pairs_s, kind="stable")
pairs_r = pairs_r[orderp]
pairs_s = pairs_s[orderp]
trips = []
occ = []
for s in np.unique(pairs_s):
    idx = pairs_r[pairs_s == s]
    for k in range(0, len(idx), 1024):
        lane_rays = idx[k:k + 1024]
        ec = enter(cb3[s], o_all[lane_rays], d_all[lane_rays],
                   cap[lane_rays])                     # (SUPER, n)
        trips.append(int(ec.any(axis=1).sum()))
        occ.append(ec.sum() / (max(trips[-1], 1) * len(lane_rays)))
trips = np.asarray(trips)
print(f"pair-blocks {len(trips)}  trips(=entered clusters/item): "
      f"mean {trips.mean():.1f}  p50 {np.percentile(trips,50):.0f} "
      f"p90 {np.percentile(trips,90):.0f} max {trips.max()}", flush=True)
print(f"in-item lane occupancy of swept clusters: {np.mean(occ):.3f}",
      flush=True)
# compare against the bundle sweep's per-block trip total
tot_bundle = 0
for b in bsel[:16]:
    sl = slice(b * 1024, (b + 1) * 1024)
    ec = enter(cb, o_all[sl], d_all[sl], cap[sl])
    tot_bundle += int(ec.any(axis=1).sum())
print(f"bundle sweep entered clusters/block (best-t cap): "
      f"{tot_bundle / 16:.0f}", flush=True)
print(f"pair-sweep total trips per 64-block sample: {trips.sum()} "
      f"(= {trips.sum() / 64:.0f}/block-equivalent)", flush=True)
print("done", flush=True)
