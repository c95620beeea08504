"""Statistical and invariant tests for Monte-Carlo sampling primitives."""

import numpy as np
import jax.numpy as jnp

from directcomputeraytracing_tpu.sampling.montecarlo import (
    concentric_sample_disk,
    cosine_sample_hemisphere,
    power_heuristic,
    sample_sphere,
    sample_triangle,
)


def grid_u(n):
    u = (np.arange(n) + 0.5) / n
    uu, vv = np.meshgrid(u, u)
    return jnp.asarray(np.stack([uu.ravel(), vv.ravel()], axis=-1), jnp.float32)


def test_disk_inside_unit_and_centered():
    pts = np.asarray(concentric_sample_disk(grid_u(64)))
    r2 = (pts**2).sum(-1)
    assert r2.max() <= 1.0 + 1e-6
    assert np.abs(pts.mean(0)).max() < 1e-2
    # area-uniform: fraction inside r=0.5 should be ~0.25
    assert abs((r2 < 0.25).mean() - 0.25) < 0.01


def test_disk_zero_maps_to_zero():
    out = np.asarray(concentric_sample_disk(jnp.asarray([[0.5, 0.5]], jnp.float32)))
    np.testing.assert_allclose(out, 0.0)


def test_cosine_hemisphere_moments():
    d = np.asarray(cosine_sample_hemisphere(grid_u(128)))
    assert (d[:, 2] >= 0).all()
    np.testing.assert_allclose((d**2).sum(-1), 1.0, atol=1e-5)
    # E[cos theta] = 2/3 for pdf = cos/pi
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 5e-3


def test_triangle_barycentric_valid_and_uniform():
    b = np.asarray(sample_triangle(grid_u(100)))
    assert (b >= 0).all() and (b.sum(-1) <= 1.0 + 1e-6).all()
    # uniform => E[u] = E[v] = 1/3
    np.testing.assert_allclose(b.mean(0), [1 / 3, 1 / 3], atol=5e-3)


def test_sphere_uniform():
    d = np.asarray(sample_sphere(grid_u(128)))
    np.testing.assert_allclose((d**2).sum(-1), 1.0, atol=1e-5)
    assert np.abs(d.mean(0)).max() < 5e-3


def test_power_heuristic():
    w = np.asarray(
        power_heuristic(1, jnp.asarray([1.0, 0.0, 2.0]), 1, jnp.asarray([1.0, 0.0, 1.0]))
    )
    np.testing.assert_allclose(w, [0.5, 0.0, 0.8], atol=1e-6)
