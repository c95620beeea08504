"""CPU two-level BVH construction (SAH bucket builder).

Host-side builder producing the packed SoA node arrays consumed by the
traversal kernels. Functional equivalent of the reference's builder
(reference: Source/BVHAccel.cpp:76-447 — iterative top-down template
shared by BLAS & TLAS, 12-bucket SAH with cost 0.125 + SA-weighted
counts, median fallback for <=4 prims, equal-split fallback for
degenerate extents, primitives reordered into leaf order; TLAS assembly
and leaf rewiring in Source/Scene.cpp:174-215, 337-391).

Node packing (see core.constants for the authoritative bit layout):
  interior:  misc = split_axis,              right_or_prim = right child
  BLAS leaf: misc = count << 3 | split_axis, right_or_prim = first prim
  TLAS leaf: misc = instance << 3 | 0x4,     right_or_prim = BLAS root offset

The builder is numpy; BVH construction is a scene-load-time cost, not a
render-time cost. (A C++ builder drop-in lives in ops/native for large
scenes; same packed layout.)
"""

from dataclasses import dataclass

import numpy as np

from ..core.constants import (
    BVHNODE_MISC_COUNT_SHIFT,
    BVHNODE_MISC_HAS_BLAS,
)

_SAH_BUCKETS = 12
_SAH_TRAVERSAL_COST = 0.125


@dataclass
class BVH:
    bbox_min: np.ndarray       # (N, 3) f32
    bbox_max: np.ndarray       # (N, 3) f32
    right_or_prim: np.ndarray  # (N,) u32
    misc: np.ndarray           # (N,) u32
    prim_order: np.ndarray     # (P,) i64: leaf-order slot -> original prim
    max_depth: int             # root depth = 1
    leaf_depths: np.ndarray    # (P,) i32 depth of the leaf holding each slot

    @property
    def num_nodes(self):
        return self.bbox_min.shape[0]


def _surface_area(bmin, bmax):
    d = np.maximum(bmax - bmin, 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                  + d[..., 2] * d[..., 0])


def build_bvh(prim_bbox_min, prim_bbox_max, max_prims_in_node=2,
              use_native=None):
    """Build a single-level BVH over primitive AABBs.

    Guarantees every leaf holds <= max_prims_in_node primitives (the
    traversal kernels unroll the leaf triangle loop to this bound).

    use_native: True/False forces the C++/numpy builder; None (default)
    uses the C++ builder when it compiles on this host (disable globally
    with DCRT_NATIVE_BVH=0). Both produce identical node arrays.
    """
    import os as _os

    if use_native is None:
        use_native = _os.environ.get("DCRT_NATIVE_BVH", "1") != "0"
    if use_native:
        from ..ops.native import build_bvh_native

        out = build_bvh_native(prim_bbox_min, prim_bbox_max,
                               max_prims_in_node)
        if out is not None:
            return out
    prim_bbox_min = np.asarray(prim_bbox_min, np.float32)
    prim_bbox_max = np.asarray(prim_bbox_max, np.float32)
    n = prim_bbox_min.shape[0]
    assert n > 0, "cannot build a BVH over zero primitives"
    centroids = 0.5 * (prim_bbox_min + prim_bbox_max)

    order = np.arange(n)
    bbox_min, bbox_max, right_or_prim, misc = [], [], [], []
    leaf_depths = np.zeros(n, np.int32)
    max_depth = 0

    def emit(bmin, bmax, rop, m):
        bbox_min.append(bmin)
        bbox_max.append(bmax)
        right_or_prim.append(rop)
        misc.append(m)
        return len(misc) - 1

    # Work stack of (lo, hi, depth, parent_to_patch). parent_to_patch is the
    # interior node whose right_or_prim must point at this subtree's root
    # (-1 for the root / left children, which sit at parent + 1).
    stack = [(0, n, 1, -1)]
    while stack:
        lo, hi, depth, patch = stack.pop()
        count = hi - lo
        idx = order[lo:hi]
        bmin = prim_bbox_min[idx].min(axis=0)
        bmax = prim_bbox_max[idx].max(axis=0)
        max_depth = max(max_depth, depth)

        cmin = centroids[idx].min(axis=0)
        cmax = centroids[idx].max(axis=0)
        extent = cmax - cmin
        axis = int(np.argmax(extent))

        make_leaf = count <= 1
        mid = -1
        if not make_leaf:
            if extent[axis] <= 0.0:
                # Degenerate: all centroids coincide — split equally so the
                # leaf bound still holds.
                if count <= max_prims_in_node:
                    make_leaf = True
                else:
                    mid = lo + count // 2
            elif count <= 4:
                # Median split
                key = centroids[idx, axis]
                part = np.argsort(key, kind="stable")
                order[lo:hi] = idx[part]
                mid = lo + count // 2
            else:
                # 12-bucket SAH
                key = centroids[idx, axis]
                rel = (key - cmin[axis]) / extent[axis]
                b = np.minimum((rel * _SAH_BUCKETS).astype(np.int64),
                               _SAH_BUCKETS - 1)
                bucket_min = np.full((_SAH_BUCKETS, 3), np.inf, np.float32)
                bucket_max = np.full((_SAH_BUCKETS, 3), -np.inf, np.float32)
                bucket_cnt = np.zeros(_SAH_BUCKETS, np.int64)
                for ib in range(_SAH_BUCKETS):
                    sel = b == ib
                    c = int(sel.sum())
                    bucket_cnt[ib] = c
                    if c:
                        bucket_min[ib] = prim_bbox_min[idx[sel]].min(axis=0)
                        bucket_max[ib] = prim_bbox_max[idx[sel]].max(axis=0)
                # prefix/suffix sweep over the B-1 candidate splits
                costs = np.empty(_SAH_BUCKETS - 1, np.float64)
                lmin = np.minimum.accumulate(bucket_min, axis=0)
                lmax = np.maximum.accumulate(bucket_max, axis=0)
                lcnt = np.cumsum(bucket_cnt)
                rmin = np.minimum.accumulate(bucket_min[::-1], axis=0)[::-1]
                rmax = np.maximum.accumulate(bucket_max[::-1], axis=0)[::-1]
                rcnt = np.cumsum(bucket_cnt[::-1])[::-1]
                total_sa = max(_surface_area(bmin, bmax), 1e-30)
                for s in range(_SAH_BUCKETS - 1):
                    sa_l = _surface_area(lmin[s], lmax[s]) if lcnt[s] else 0.0
                    sa_r = (_surface_area(rmin[s + 1], rmax[s + 1])
                            if rcnt[s + 1] else 0.0)
                    costs[s] = _SAH_TRAVERSAL_COST + (
                        lcnt[s] * sa_l + rcnt[s + 1] * sa_r) / total_sa
                best = int(np.argmin(costs))
                leaf_cost = float(count)
                if count > max_prims_in_node or costs[best] < leaf_cost:
                    sel_left = b <= best
                    if sel_left.all() or not sel_left.any():
                        # SAH put everything on one side: equal fallback
                        part = np.argsort(key, kind="stable")
                        order[lo:hi] = idx[part]
                        mid = lo + count // 2
                    else:
                        order[lo:hi] = np.concatenate(
                            [idx[sel_left], idx[~sel_left]])
                        mid = lo + int(sel_left.sum())
                else:
                    make_leaf = True

        if make_leaf:
            emit(bmin, bmax, lo,
                 (count << BVHNODE_MISC_COUNT_SHIFT) | axis)
            leaf_depths[lo:hi] = depth
        else:
            node = emit(bmin, bmax, 0, axis)  # right child patched later
            # Left subtree is emitted next (depth-first), so push right first.
            stack.append((mid, hi, depth + 1, node))
            stack.append((lo, mid, depth + 1, -1))
        if patch >= 0:
            right_or_prim[patch] = len(misc) - 1

    return BVH(
        bbox_min=np.asarray(bbox_min, np.float32),
        bbox_max=np.asarray(bbox_max, np.float32),
        right_or_prim=np.asarray(right_or_prim, np.uint32),
        misc=np.asarray(misc, np.uint32),
        prim_order=order,
        max_depth=max_depth,
        leaf_depths=leaf_depths,
    )


def transform_aabb(bmin, bmax, m43):
    """World AABB of a transformed local AABB ((4,3) row-vector affine)."""
    corners = np.array([[x, y, z] for x in (bmin[0], bmax[0])
                        for y in (bmin[1], bmax[1])
                        for z in (bmin[2], bmax[2])], np.float32)
    world = corners @ m43[:3, :] + m43[3, :]
    return world.min(axis=0), world.max(axis=0)


@dataclass
class TwoLevelBVH:
    """Concatenated TLAS + BLAS node arrays plus traversal metadata.

    Matches the reference's single GPU node buffer: TLAS nodes at offset 0,
    each BLAS following, TLAS leaves rewired to (instance, BLAS offset)
    (reference: Source/Scene.cpp:337-391)."""

    bbox_min: np.ndarray
    bbox_max: np.ndarray
    right_or_prim: np.ndarray
    misc: np.ndarray
    max_stack: int


def build_two_level(blas_list, mesh_tri_offsets, instance_mesh,
                    instance_transforms):
    """Assemble the concatenated TLAS+BLAS node buffer.

    blas_list: one `BVH` per mesh (built over that mesh's triangles with
        triangle indices local to the mesh).
    mesh_tri_offsets: global triangle offset of each mesh in the
        concatenated triangle buffer.
    instance_mesh: (I,) mesh index per instance.
    instance_transforms: (I, 4, 3) local->world.

    Returns (TwoLevelBVH, tlas_prim_order) where tlas_prim_order maps the
    TLAS leaf order back to original instance indices (the reference keeps
    the same mapping as m_ReorderedInstanceIndices, Scene.cpp:209-214).
    """
    num_instances = len(instance_mesh)
    inst_bmin = np.empty((num_instances, 3), np.float32)
    inst_bmax = np.empty((num_instances, 3), np.float32)
    for i in range(num_instances):
        blas = blas_list[instance_mesh[i]]
        inst_bmin[i], inst_bmax[i] = transform_aabb(
            blas.bbox_min[0], blas.bbox_max[0], instance_transforms[i])

    tlas = build_bvh(inst_bmin, inst_bmax, max_prims_in_node=1)

    # BLAS node offsets in the concatenated buffer
    blas_offsets = np.zeros(len(blas_list), np.int64)
    off = tlas.num_nodes
    for m, blas in enumerate(blas_list):
        blas_offsets[m] = off
        off += blas.num_nodes

    total = off
    bbox_min = np.empty((total, 3), np.float32)
    bbox_max = np.empty((total, 3), np.float32)
    rop = np.empty(total, np.uint32)
    misc = np.empty(total, np.uint32)

    # TLAS nodes, leaves rewired to hasBLAS descriptors
    bbox_min[: tlas.num_nodes] = tlas.bbox_min
    bbox_max[: tlas.num_nodes] = tlas.bbox_max
    tl_count = (tlas.misc >> BVHNODE_MISC_COUNT_SHIFT).astype(np.int64)
    for node in range(tlas.num_nodes):
        if tl_count[node] == 0:  # interior
            rop[node] = tlas.right_or_prim[node]
            misc[node] = tlas.misc[node]
        else:  # leaf: exactly one instance (max_prims_in_node=1)
            slot = int(tlas.right_or_prim[node])
            inst = int(tlas.prim_order[slot])
            mesh = instance_mesh[inst]
            rop[node] = np.uint32(blas_offsets[mesh])
            misc[node] = np.uint32(
                (inst << BVHNODE_MISC_COUNT_SHIFT) | BVHNODE_MISC_HAS_BLAS)

    # BLAS nodes with offsets applied
    max_stack = 0
    for m, blas in enumerate(blas_list):
        o = blas_offsets[m]
        e = o + blas.num_nodes
        bbox_min[o:e] = blas.bbox_min
        bbox_max[o:e] = blas.bbox_max
        cnt = (blas.misc >> BVHNODE_MISC_COUNT_SHIFT).astype(np.int64)
        interior = cnt == 0
        rop[o:e] = np.where(
            interior,
            blas.right_or_prim.astype(np.int64) + o,
            blas.right_or_prim.astype(np.int64) + mesh_tri_offsets[m],
        ).astype(np.uint32)
        misc[o:e] = blas.misc

    # Conservative global traversal stack bound: deepest TLAS leaf path plus
    # the deepest BLAS under it (reference: Scene.cpp:199-207 feeds this to
    # shaders as RT_BVH_TRAVERSAL_STACK_SIZE).
    for i in range(num_instances):
        slot = int(np.nonzero(tlas.prim_order == i)[0][0])
        depth_i = int(tlas.leaf_depths[slot])
        max_stack = max(
            max_stack, depth_i + blas_list[instance_mesh[i]].max_depth)

    return (
        TwoLevelBVH(bbox_min=bbox_min, bbox_max=bbox_max,
                    right_or_prim=rop, misc=misc,
                    max_stack=max_stack + 1),
        tlas.prim_order,
    )


def serialize_bvh_to_xml(scene):
    """Dump every BLAS + the TLAS as XML for offline inspection/diffing
    (reference: -OutputBVH, Source/BVHAccel.cpp:449-523 SerializeBVHToXML
    + Scene.cpp:233-264)."""
    from ..scene.scene import triangle_bounds
    import io

    out = io.StringIO()
    out.write("<BVHDump>\n")

    def write_nodes(bvh, tag):
        out.write(f"  <{tag} nodeCount=\"{bvh.num_nodes}\" "
                  f"maxDepth=\"{bvh.max_depth}\">\n")
        for i in range(bvh.num_nodes):
            misc = int(bvh.misc[i])
            count = misc >> BVHNODE_MISC_COUNT_SHIFT
            kind = ("tlasLeaf" if misc & BVHNODE_MISC_HAS_BLAS
                    else ("leaf" if count else "interior"))
            bmin = bvh.bbox_min[i]
            bmax = bvh.bbox_max[i]
            out.write(
                f"    <Node index=\"{i}\" kind=\"{kind}\" "
                f"rightOrPrim=\"{int(bvh.right_or_prim[i])}\" "
                f"misc=\"{misc}\" "
                f"bboxMin=\"{bmin[0]:.6g} {bmin[1]:.6g} {bmin[2]:.6g}\" "
                f"bboxMax=\"{bmax[0]:.6g} {bmax[1]:.6g} {bmax[2]:.6g}\"/>\n")
        out.write(f"  </{tag}>\n")

    blas_list = []
    offsets = np.zeros(len(scene.meshes), np.int64)
    cursor = 0
    for m, mesh in enumerate(scene.meshes):
        bmin, bmax = triangle_bounds(mesh.positions, mesh.indices)
        blas = build_bvh(bmin, bmax, max_prims_in_node=2)
        blas_list.append(blas)
        offsets[m] = cursor
        cursor += mesh.indices.shape[0]
        write_nodes(blas, f"BLAS_{m}")

    inst_mesh = [inst.mesh for inst in scene.instances]
    inst_tf = np.stack([inst.transform for inst in scene.instances])
    two_level, _ = build_two_level(blas_list, offsets, inst_mesh, inst_tf)

    class _View:
        bbox_min = two_level.bbox_min
        bbox_max = two_level.bbox_max
        right_or_prim = two_level.right_or_prim
        misc = two_level.misc
        num_nodes = two_level.bbox_min.shape[0]
        max_depth = two_level.max_stack

    write_nodes(_View, "CombinedTLASPlusBLAS")
    out.write("</BVHDump>\n")
    return out.getvalue()
