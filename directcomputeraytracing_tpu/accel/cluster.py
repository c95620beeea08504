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

import numpy as np

# Small clusters keep the exact sweep close to the rays' true needs:
# measured on v5e, 64-tri clusters made bundle sweeps test ~2700
# triangles per ray where ~3 suffice; 16-tri clusters cut the tested
# set ~5x for the same cull cost class.
CLUSTER_SIZE = 16


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
