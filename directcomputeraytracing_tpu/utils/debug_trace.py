"""Host-side (numpy) debug ray tracer with traversal counters.

The analogue of the reference's CPU reference tracer / "Ray Tracing Tool"
(reference: Source/SceneRayTrace.cpp:58-208 CScene::TraceRay — a scalar
CPU duplicate of the GPU two-level traversal returning
SRayTraversalCounters {triangleTests, boxTests, BLASEnterings,
BLASLeafTests}, surfaced in ImGui.cpp:747-782). Used as an independent
correctness oracle for the device traversal and as a per-ray cost probe.
"""

from dataclasses import dataclass

import numpy as np

from ..core.constants import (
    BVHNODE_MISC_COUNT_SHIFT,
    BVHNODE_MISC_HAS_BLAS,
)


@dataclass
class TraversalCounters:
    triangle_tests: int = 0
    box_tests: int = 0
    blas_enterings: int = 0
    blas_leaf_tests: int = 0


@dataclass
class DebugHit:
    hit: bool
    t: float
    u: float
    v: float
    triangle: int
    instance: int
    backface: bool
    counters: TraversalCounters


def _ray_aabb(o, inv_d, t_min, t_max, bmin, bmax):
    ta = (bmin - o) * inv_d
    tb = (bmax - o) * inv_d
    t0 = np.minimum(ta, tb).max()
    t1 = np.maximum(ta, tb).min()
    return (t1 >= t0) and (t0 < t_max) and (t1 >= t_min)


def _ray_tri(o, d, t_min, t_max, v0, v1, v2):
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = np.cross(d, e2)
    det = float(e1 @ pvec)
    if abs(det) < 1e-10:
        return None
    inv_det = 1.0 / det
    tvec = o - v0
    u = float(tvec @ pvec) * inv_det
    if u < 0.0 or u > 1.0:
        return None
    qvec = np.cross(tvec, e1)
    v = float(d @ qvec) * inv_det
    if v < 0.0 or u + v > 1.0:
        return None
    t = float(e2 @ qvec) * inv_det
    if t < t_min or t >= t_max:
        return None
    return t, u, v, det > -1e-10


def trace_ray(arrays, origin, direction, t_min=0.0, t_max=np.inf):
    """Scalar two-level traversal over the flattened SceneArrays with
    per-ray counters; mirrors the device kernel's visit order."""
    node_table = np.asarray(arrays.node_table)
    tri_verts = np.asarray(arrays.tri_verts)
    inv_tf = np.asarray(arrays.instance_inv_transforms)

    o_w = np.asarray(origin, np.float64)
    d_w = np.asarray(direction, np.float64)
    o, d = o_w.copy(), d_w.copy()
    counters = TraversalCounters()
    best = None
    stack = []
    node = 0
    is_blas = False
    instance = -1
    t_best = t_max

    def inv(dv):
        return 1.0 / np.where(np.abs(dv) < 1e-30,
                              np.where(dv >= 0, 1e-30, -1e-30), dv)

    while True:
        row = node_table[node]
        bmin, bmax = row[0:3], row[3:6]
        rop = int(row[6])
        misc = int(row[7])
        counters.box_tests += 1
        box_hit = _ray_aabb(o, inv(d), t_min, t_best, bmin, bmax)

        descend_or_pop = "pop"
        if box_hit:
            if misc & BVHNODE_MISC_HAS_BLAS:
                instance = misc >> BVHNODE_MISC_COUNT_SHIFT
                counters.blas_enterings += 1
                m = inv_tf[instance].astype(np.float64)
                o = o_w @ m[:3] + m[3]
                d = d_w @ m[:3]
                node = rop
                is_blas = True
                continue
            count = misc >> BVHNODE_MISC_COUNT_SHIFT
            if count == 0:
                axis = misc & 0x3
                left = node + 1
                if d[axis] < 0.0:
                    stack.append((left, is_blas))
                    node = rop
                else:
                    stack.append((rop, is_blas))
                    node = left
                continue
            counters.blas_leaf_tests += 1
            for k in range(count):
                counters.triangle_tests += 1
                tv = tri_verts[rop + k].astype(np.float64)
                r = _ray_tri(o, d, t_min, t_best, tv[0:3], tv[3:6],
                             tv[6:9])
                if r is not None:
                    t, u, v, back = r
                    t_best = t
                    best = DebugHit(True, t, u, v, rop + k, instance,
                                    back, counters)
        if not stack:
            break
        (node, was_blas) = stack.pop()
        if is_blas and not was_blas:
            o, d = o_w.copy(), d_w.copy()
        is_blas = was_blas

    if best is None:
        return DebugHit(False, np.inf, 0.0, 0.0, -1, -1, False, counters)
    return best


def screen_to_camera_ray(cam, cfg, x, y):
    """Pixel-center camera ray (reference: ScreenToCameraRay,
    SceneRayTrace.cpp:210-224)."""
    import jax.numpy as jnp

    from ..camera.camera import generate_ray

    film = jnp.asarray([[(x + 0.5) / cfg.width, (y + 0.5) / cfg.height]],
                       jnp.float32)
    ap = jnp.zeros((1, 3), jnp.float32)
    o, d = generate_ray(cam, film, ap)
    return np.asarray(o[0]), np.asarray(d[0])
