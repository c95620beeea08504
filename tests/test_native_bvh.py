"""C++ native BVH builder vs NumPy builder: node-for-node equivalence."""

import time

import numpy as np
import pytest

from directcomputeraytracing_tpu.accel.build import build_bvh
from directcomputeraytracing_tpu.ops.native import (
    build_bvh_native, load_native,
)


def _random_boxes(n, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    h = rng.uniform(0.01, 0.5, (n, 3)).astype(np.float32)
    return c - h, c + h


@pytest.fixture(scope="module")
def native_available():
    if load_native() is None:
        pytest.skip("native toolchain unavailable")
    return True


@pytest.mark.parametrize("n,max_prims", [(1, 2), (3, 2), (7, 1), (64, 2),
                                         (500, 2), (500, 1), (2000, 2)])
def test_native_matches_numpy(native_available, n, max_prims):
    bmin, bmax = _random_boxes(n, seed=n)
    a = build_bvh(bmin, bmax, max_prims, use_native=False)
    b = build_bvh_native(bmin, bmax, max_prims)
    np.testing.assert_array_equal(a.misc, b.misc)
    np.testing.assert_array_equal(a.right_or_prim, b.right_or_prim)
    np.testing.assert_allclose(a.bbox_min, b.bbox_min)
    np.testing.assert_allclose(a.bbox_max, b.bbox_max)
    np.testing.assert_array_equal(a.prim_order, b.prim_order)
    np.testing.assert_array_equal(a.leaf_depths, b.leaf_depths)
    assert a.max_depth == b.max_depth


def test_degenerate_identical_centroids(native_available):
    # all prims share a centroid: equal-split fallback path
    bmin = np.zeros((9, 3), np.float32)
    bmax = np.ones((9, 3), np.float32)
    a = build_bvh(bmin, bmax, 2, use_native=False)
    b = build_bvh_native(bmin, bmax, 2)
    np.testing.assert_array_equal(a.misc, b.misc)
    np.testing.assert_array_equal(a.right_or_prim, b.right_or_prim)


@pytest.mark.slow
def test_native_is_faster_at_scale(native_available):
    bmin, bmax = _random_boxes(100_000, seed=42)
    t0 = time.perf_counter()
    build_bvh(bmin, bmax, 2, use_native=False)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    build_bvh_native(bmin, bmax, 2)
    t_cc = time.perf_counter() - t0
    # the C++ builder must beat numpy comfortably on big scenes
    assert t_cc < t_py
