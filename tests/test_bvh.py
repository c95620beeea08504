"""BVH build invariants and traversal correctness vs brute force."""

import numpy as np
import jax.numpy as jnp
import pytest

from directcomputeraytracing_tpu.accel.build import build_bvh, build_two_level
from directcomputeraytracing_tpu.accel.traverse import (
    intersect_any,
    intersect_closest,
)
from directcomputeraytracing_tpu.core.constants import (
    BVHNODE_MISC_COUNT_SHIFT,
    BVHNODE_MISC_HAS_BLAS,
)
from directcomputeraytracing_tpu.scene.scene import (
    Instance,
    Material,
    Mesh,
    Scene,
    flatten_scene,
    triangle_bounds,
)


def random_mesh(rng, n_tris, scale=1.0, offset=0.0):
    base = rng.uniform(-1, 1, size=(n_tris, 3)) * scale + offset
    d1 = rng.uniform(-0.2, 0.2, size=(n_tris, 3)) * scale
    d2 = rng.uniform(-0.2, 0.2, size=(n_tris, 3)) * scale
    pos = np.concatenate([base, base + d1, base + d2]).astype(np.float32)
    idx = np.arange(3 * n_tris).reshape(3, n_tris).T
    return Mesh(positions=pos, indices=idx)


def brute_force_closest(scene_np, origins, dirs):
    """Numpy oracle: test every triangle of every instance."""
    (vp, tris, inst_mesh_range, inst_inv) = scene_np
    R = origins.shape[0]
    best_t = np.full(R, np.inf)
    best_tri = np.full(R, -1)
    best_inst = np.full(R, -1)
    for i, (lo_t, hi_t) in enumerate(inst_mesh_range):
        m = inst_inv[i]
        o = origins @ m[:3] + m[3]
        d = dirs @ m[:3]
        for tt in range(lo_t, hi_t):
            v0, v1, v2 = vp[tris[tt, 0]], vp[tris[tt, 1]], vp[tris[tt, 2]]
            e1, e2 = v1 - v0, v2 - v0
            pvec = np.cross(d, e2)
            det = (e1 * pvec).sum(-1)
            ok = np.abs(det) >= 1e-10
            inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
            tvec = o - v0
            u = (tvec * pvec).sum(-1) * inv
            qvec = np.cross(tvec, e1)
            v = (d * qvec).sum(-1) * inv
            t = (e2 * qvec).sum(-1) * inv
            hit = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & \
                (t >= 0) & (t < best_t)
            best_t = np.where(hit, t, best_t)
            best_tri = np.where(hit, tt, best_tri)
            best_inst = np.where(hit, i, best_inst)
    return best_t, best_tri, best_inst


def scene_to_np(arrays, scene):
    vp = np.asarray(arrays.vtx_position)
    tris = np.asarray(arrays.triangles).astype(np.int64)
    # per-instance global triangle range
    offsets = []
    cursor = 0
    per_mesh = []
    for mesh in scene.meshes:
        per_mesh.append((cursor, cursor + mesh.indices.shape[0]))
        cursor += mesh.indices.shape[0]
    ranges = [per_mesh[inst.mesh] for inst in scene.instances]
    inv = np.asarray(arrays.instance_inv_transforms)
    return (vp, tris, ranges, inv)


def test_bvh_build_invariants():
    rng = np.random.default_rng(0)
    mesh = random_mesh(rng, 300)
    bmin, bmax = triangle_bounds(mesh.positions, mesh.indices)
    bvh = build_bvh(bmin, bmax, max_prims_in_node=2)

    # prim_order is a permutation
    assert sorted(bvh.prim_order.tolist()) == list(range(300))
    counts = (bvh.misc >> BVHNODE_MISC_COUNT_SHIFT).astype(int)
    assert counts.max() <= 2
    # leaves cover all prims exactly once
    covered = np.zeros(300, bool)
    for n in range(bvh.num_nodes):
        if counts[n] > 0:
            lo = int(bvh.right_or_prim[n])
            assert not covered[lo:lo + counts[n]].any()
            covered[lo:lo + counts[n]] = True
            # leaf bbox contains its primitives
            for s in range(lo, lo + counts[n]):
                p = bvh.prim_order[s]
                assert (bvh.bbox_min[n] <= bmin[p] + 1e-5).all()
                assert (bvh.bbox_max[n] >= bmax[p] - 1e-5).all()
        else:
            # interior: children bounded by parent, right child after left
            r = int(bvh.right_or_prim[n])
            assert n + 1 < bvh.num_nodes and n + 1 < r < bvh.num_nodes
            for c in (n + 1, r):
                assert (bvh.bbox_min[n] <= bvh.bbox_min[c] + 1e-5).all()
                assert (bvh.bbox_max[n] >= bvh.bbox_max[c] - 1e-5).all()
    assert covered.all()
    assert bvh.max_depth <= 40


def test_bvh_degenerate_all_same_centroid():
    # 20 triangles with identical centroids must still split to <=2 leaves
    tri = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    bmin = np.repeat(tri.min(0)[None], 20, 0)
    bmax = np.repeat(tri.max(0)[None], 20, 0)
    bvh = build_bvh(bmin, bmax, max_prims_in_node=2)
    counts = (bvh.misc >> BVHNODE_MISC_COUNT_SHIFT).astype(int)
    assert counts.max() <= 2


def make_two_instance_scene():
    rng = np.random.default_rng(1)
    mesh_a = random_mesh(rng, 120)
    mesh_b = random_mesh(rng, 60, scale=0.5)
    # instance 1: identity; instance 2: mesh_b rotated + translated;
    # instance 3: mesh_a uniformly scaled
    c, s = np.cos(0.7), np.sin(0.7)
    rot = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]], np.float32)
    t2 = np.concatenate([rot, np.array([[2.5, 0.3, -0.2]], np.float32)])
    t3 = np.concatenate([np.eye(3, dtype=np.float32) * 0.5,
                         np.array([[-2.0, 0.0, 1.0]], np.float32)])
    scene = Scene(
        meshes=[mesh_a, mesh_b],
        instances=[Instance(mesh=0), Instance(mesh=1, transform=t2),
                   Instance(mesh=0, transform=t3)],
        materials=[Material()],
    )
    return scene


def aimed_rays(rng, n):
    """Rays from a shell aimed at the three instance neighbourhoods."""
    targets = np.array([[0, 0, 0], [2.5, 0.3, -0.2], [-2.0, 0.0, 1.0]])
    origins = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    aim = (targets[rng.integers(0, 3, n)]
           + rng.uniform(-0.8, 0.8, size=(n, 3)))
    dirs = (aim - origins).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return origins, dirs


@pytest.fixture(scope="module")
def two_instance():
    scene = make_two_instance_scene()
    arrays, meta = flatten_scene(scene)
    return scene, arrays, meta


@pytest.mark.parametrize("backend", ["jax", "brute"])
def test_closest_hit_matches_brute_force(two_instance, backend):
    scene, arrays, meta = two_instance
    rng = np.random.default_rng(7)
    R = 512
    origins, dirs = aimed_rays(rng, R)

    hi = intersect_closest(arrays, jnp.asarray(origins), jnp.asarray(dirs),
                           stack_size=meta.stack_size, backend=backend)
    bt, btri, binst = brute_force_closest(
        scene_to_np(arrays, scene), origins, dirs)

    got_hit = np.asarray(hi.hit)
    want_hit = np.isfinite(bt)
    np.testing.assert_array_equal(got_hit, want_hit)
    assert want_hit.sum() > 50, "test scene should produce plenty of hits"
    np.testing.assert_allclose(
        np.asarray(hi.t)[want_hit], bt[want_hit], rtol=1e-4, atol=1e-5)
    # same instance except exact-tie cases
    agree = (np.asarray(hi.instance)[want_hit] == binst[want_hit])
    assert agree.mean() > 0.99


@pytest.mark.parametrize("backend", ["jax", "brute"])
def test_anyhit_matches_brute_force(two_instance, backend):
    scene, arrays, meta = two_instance
    rng = np.random.default_rng(8)
    R = 512
    origins, dirs = aimed_rays(rng, R)
    t_max = rng.uniform(0.5, 6.0, size=R).astype(np.float32)

    occ = intersect_any(arrays, jnp.asarray(origins), jnp.asarray(dirs),
                        jnp.asarray(t_max), stack_size=meta.stack_size,
                        backend=backend)
    bt, _, _ = brute_force_closest(scene_to_np(arrays, scene), origins, dirs)
    want = np.isfinite(bt) & (bt < t_max)
    np.testing.assert_array_equal(np.asarray(occ), want)


def test_miss_rays(two_instance):
    scene, arrays, meta = two_instance
    origins = np.full((4, 3), 100.0, np.float32)
    dirs = np.tile(np.array([[1.0, 0, 0]], np.float32), (4, 1))
    hi = intersect_closest(arrays, jnp.asarray(origins), jnp.asarray(dirs),
                           stack_size=meta.stack_size)
    assert not np.asarray(hi.hit).any()


def test_tlas_leaf_packing(two_instance):
    scene, arrays, meta = two_instance
    misc = np.asarray(arrays.node_misc)
    has_blas = (misc & BVHNODE_MISC_HAS_BLAS) != 0
    assert has_blas.sum() == len(scene.instances)
    insts = sorted((misc[has_blas] >> BVHNODE_MISC_COUNT_SHIFT).tolist())
    assert insts == [0, 1, 2]
