"""Triangle clustering for the cull-and-sweep Pallas intersector.

Groups the world-space triangle soup into spatially-tight clusters of at
most CLUSTER_SIZE triangles by recursive median split over centroids
(host-side, scene-load time). Each cluster occupies a fixed
CLUSTER_SIZE-row slab of the padded triangle table (degenerate padding
rows never hit), so the device kernel indexes cluster k's triangles as
rows [k*CLUSTER_SIZE, (k+1)*CLUSTER_SIZE) with no range indirection.

This replaces deep per-ray BVH descent with a two-phase TPU shape:
dense ray-vs-cluster-AABB culling, then dense Moeller sweeps over only
the clusters a ray block actually enters (the reference's per-thread
stack traversal, Shaders/BVHAccel.inc.hlsl:85-232, re-designed for a
vector machine).
"""

import os

import numpy as np

# Small clusters keep the exact sweep close to the rays' true needs:
# measured on v5e, 64-tri clusters made bundle sweeps test ~2700
# triangles per ray where ~3 suffice; 16-tri clusters cut the tested
# set ~5x for the same cull cost class.
CLUSTER_SIZE = 16
# Clusters per supercluster (the work-list kernels' fan-out; shared by
# the host-side instanced-super builder and accel.worklist).
SUPER_SIZE = int(os.environ.get("DCRT_WL_SUPER", "32"))


def _median_split(cen, cluster_size):
    clusters = []

    def split(idx):
        if idx.size <= cluster_size:
            clusters.append(idx)
            return
        c = cen[idx]
        axis = int(np.argmax(c.max(0) - c.min(0)))
        order = idx[np.argsort(c[:, axis], kind="stable")]
        half = idx.size // 2
        split(order[:half])
        split(order[half:])

    split(np.arange(cen.shape[0]))
    return clusters


def build_local_clusters(tri_verts, tri_offsets, mesh_tri_counts,
                         cluster_size=CLUSTER_SIZE,
                         super_size=SUPER_SIZE):
    """Mesh-LOCAL cluster slabs with BLAS sharing (the memory model of
    the reference's TLAS->BLAS instancing, Source/Scene.cpp:337-391:
    geometry stored once per mesh, instances reference it).

    tri_verts: (T, 9) leaf-ordered local triangles, all meshes
    concatenated; tri_offsets/mesh_tri_counts: per-mesh ranges.

    Returns (slab (CL*cluster_size, 13), lbox (CL, 8) local cluster
    boxes, mesh_super_offset (M,), mesh_super_count (M,)). Each mesh's
    cluster run is padded to a super_size multiple so superclusters
    never straddle meshes; slab cols: v0|v1|v2 local, GLOBAL leaf tri
    id, 0, 0, local row."""
    slabs, boxes = [], []
    mso = np.zeros(len(tri_offsets), np.int64)
    msc = np.zeros(len(tri_offsets), np.int64)
    sup_cursor = 0
    for m, (lo, n) in enumerate(zip(tri_offsets, mesh_tri_counts)):
        v = tri_verts[lo:lo + n].reshape(n, 3, 3)
        cen = v.mean(axis=1)
        clusters = _median_split(cen, cluster_size)
        c_count = -(-len(clusters) // super_size) * super_size
        tab = np.zeros((c_count * cluster_size, 13), np.float32)
        bbox = np.zeros((c_count, 8), np.float32)
        bbox[:, 0:3] = 1.0      # inverted padding boxes: never entered
        bbox[:, 3:6] = -1.0
        for k, idx in enumerate(clusters):
            rows = np.concatenate(
                [tri_verts[lo + idx],
                 (lo + idx)[:, None].astype(np.float32),
                 np.zeros((idx.size, 2), np.float32),
                 idx[:, None].astype(np.float32)], axis=1)
            tab[k * cluster_size: k * cluster_size + idx.size] = rows
            vv = v[idx]
            bbox[k, 0:3] = vv.min(axis=(0, 1))
            bbox[k, 3:6] = vv.max(axis=(0, 1))
        slabs.append(tab)
        boxes.append(bbox)
        mso[m] = sup_cursor
        msc[m] = c_count // super_size
        sup_cursor += msc[m]
    return (np.concatenate(slabs), np.concatenate(boxes), mso, msc)


def baldwin_table(slab):
    """Per-triangle Baldwin-Weber transform rows from a cluster slab
    (Baldwin & Weber, JCGT 2016: precompute the world->barycentric
    affine transform so the in-kernel test is a plane intersection plus
    two dot products — ~40 VPU ops vs Moeller's ~60 on (S, RB) rows).

    slab cols 0-8 = v0|v1|v2, 9-11 = meta (tri/inst/flip or tri/0/0),
    12 = row. Returns (N, 16) f32:
      [n(3) | c0 | r1(3) | c1 | r2(3) | c2 | meta(3) | row]
    with t = (c0 - n.o)/(n.d), h = o + t d, u = r1.h + c1,
    v = r2.h + c2. den = n.d equals Moeller's -det exactly, so the
    1e-10 degeneracy threshold and the backface sign carry over.
    Constants are derived in float64 and rounded once. Degenerate and
    padding triangles produce n = 0 -> den = 0 -> never hit."""
    v = slab[:, 0:9].astype(np.float64).reshape(-1, 3, 3)
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    n = np.cross(e1, e2)
    n2 = (n * n).sum(1)
    safe = np.where(n2 > 0, n2, 1.0)[:, None]
    r1 = np.cross(e2, n) / safe
    r2 = np.cross(n, e1) / safe
    c0 = (n * v[:, 0]).sum(1)
    c1 = -(r1 * v[:, 0]).sum(1)
    c2 = -(r2 * v[:, 0]).sum(1)
    deg = n2 <= 0.0
    n = np.where(deg[:, None], 0.0, n)
    return np.concatenate(
        [n, c0[:, None], r1, c1[:, None], r2, c2[:, None],
         slab[:, 9:12], slab[:, 12:13]], axis=1).astype(np.float32)


def _morton3(q, bits=8):
    out = np.zeros(q.shape[0], np.int64)
    for b in range(bits):
        for ax in range(3):
            out |= ((q[:, ax].astype(np.int64) >> b) & 1) << (3 * b + ax)
    return out


def build_instanced_supers(lbox, mesh_super_offset, mesh_super_count,
                           inst_mesh, inst_tf, super_size=SUPER_SIZE):
    """Per-(instance, supercluster) WORLD-space box tables for the
    instanced work-list traversal (the reference transforms the ray
    into BLAS space per TLAS leaf, Shaders/BVHAccel.inc.hlsl:127-140;
    here each sweep item carries its instance and transforms the ray
    bundle in-kernel).

    Returns (isup_cbox (NS, super_size, 8) world child boxes,
    isup_sbox (NS, 8) world super boxes, isup_local (NS,) local super
    id into the shared slab table, isup_inst (NS,)) Morton-sorted by
    super-box center so the phase-A hierarchy gets spatially tight
    hyper unions."""
    corners_sel = np.array(
        [[x, y, z] for x in (0, 3) for y in (1, 4) for z in (2, 5)])
    cb, sb, sl, si = [], [], [], []
    for i, m in enumerate(inst_mesh):
        a = inst_tf[i][:3]
        t = inst_tf[i][3]
        s0 = int(mesh_super_offset[m])
        ns = int(mesh_super_count[m])
        box = lbox[s0 * super_size:(s0 + ns) * super_size]   # (ns*S, 8)
        # world AABB of each local cluster box: transform 8 corners
        crn = box[:, corners_sel]                            # (n, 8, 3)
        w = crn @ a + t
        inv = box[:, 0] > box[:, 3]          # inverted padding clusters
        bmin = np.where(inv[:, None], 1.0, w.min(axis=1))
        bmax = np.where(inv[:, None], -1.0, w.max(axis=1))
        cbox = np.concatenate(
            [bmin, bmax, np.zeros((box.shape[0], 2), np.float32)],
            axis=1).astype(np.float32).reshape(ns, super_size, 8)
        real = ~inv.reshape(ns, super_size)
        smin = np.where(
            real.any(1)[:, None],
            np.where(real[..., None], cbox[..., 0:3], np.inf).min(1), 1.0)
        smax = np.where(
            real.any(1)[:, None],
            np.where(real[..., None], cbox[..., 3:6], -np.inf).max(1),
            -1.0)
        cb.append(cbox)
        sb.append(np.concatenate(
            [smin, smax, np.zeros((ns, 2), np.float32)],
            axis=1).astype(np.float32))
        sl.append(np.arange(s0, s0 + ns, dtype=np.int32))
        si.append(np.full(ns, i, np.int32))
    isup_cbox = np.concatenate(cb)
    isup_sbox = np.concatenate(sb)
    isup_local = np.concatenate(sl)
    isup_inst = np.concatenate(si)
    cen = 0.5 * (isup_sbox[:, 0:3] + isup_sbox[:, 3:6])
    lo = cen.min(axis=0)
    ext = np.maximum(cen.max(axis=0) - lo, 1e-9)
    q = np.clip((cen - lo) / ext * 255.0, 0, 255).astype(np.int64)
    order = np.argsort(_morton3(q), kind="stable")
    return (isup_cbox[order], isup_sbox[order], isup_local[order],
            isup_inst[order])


def build_clusters(world_tris, world_tri_meta, cluster_size=CLUSTER_SIZE):
    """Returns (padded_tris (C*S, 13), cluster_bbox (C, 8)).

    padded_tris rows: v0|v1|v2 xyz, tri id, instance id, winding flip,
    world-soup row (cols 0..12; pallas_brute reads 0..11, the work-list
    sweep also reads col 12); cluster_bbox rows: bmin xyz, bmax xyz,
    pad, pad.
    """
    tris = np.asarray(world_tris, np.float32)
    meta = np.asarray(world_tri_meta, np.float32)
    n = tris.shape[0]
    v = tris.reshape(n, 3, 3)
    cen = v.mean(axis=1)

    clusters = []

    def split(idx):
        if idx.size <= cluster_size:
            clusters.append(idx)
            return
        c = cen[idx]
        axis = int(np.argmax(c.max(0) - c.min(0)))
        order = idx[np.argsort(c[:, axis], kind="stable")]
        half = idx.size // 2
        split(order[:half])
        split(order[half:])

    split(np.arange(n))

    c_count = len(clusters)
    tab = np.zeros((c_count * cluster_size, 13), np.float32)
    bbox = np.zeros((c_count, 8), np.float32)
    for k, idx in enumerate(clusters):
        rows = np.concatenate(
            [tris[idx], meta[idx], idx[:, None].astype(np.float32)],
            axis=1)
        tab[k * cluster_size: k * cluster_size + idx.size] = rows
        vv = v[idx]
        bbox[k, 0:3] = vv.min(axis=(0, 1))
        bbox[k, 3:6] = vv.max(axis=(0, 1))
    return tab, bbox
