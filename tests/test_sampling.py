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


def _chi2_uniform(counts):
    """Chi-square statistic against the uniform expectation."""
    expected = counts.sum() / counts.size
    return float(((counts - expected) ** 2 / expected).sum())


def test_chi2_cosine_hemisphere():
    """Chi-square GOF on the cosine-hemisphere sampler: bin phi uniformly
    and cos^2(theta) uniformly (both are uniform under the target pdf)."""
    import numpy as np
    import jax.numpy as jnp
    from directcomputeraytracing_tpu.sampling.montecarlo import (
        cosine_sample_hemisphere,
    )
    rng = np.random.default_rng(3)
    n = 1 << 16
    u2 = jnp.asarray(rng.random((n, 2), dtype=np.float32))
    w = np.asarray(cosine_sample_hemisphere(u2))
    phi = np.arctan2(w[:, 1], w[:, 0])
    cz2 = np.clip(w[:, 2] ** 2, 0, 1)
    k = 32
    c1 = np.histogram(phi, bins=k, range=(-np.pi, np.pi))[0]
    c2 = np.histogram(cz2, bins=k, range=(0, 1))[0]
    # 99.9% chi2 critical value for 31 dof ~ 61.1
    assert _chi2_uniform(c1) < 61.1
    assert _chi2_uniform(c2) < 61.1


def test_chi2_ggx_ndf_sampling():
    """GGX NDF sampler: D(m)|cos| importance means G = 1 - a2/(a2 + t2)
    with t = tan(theta) is uniform on [0,1); phi uniform."""
    import numpy as np
    import jax.numpy as jnp
    from directcomputeraytracing_tpu.bsdf.ggx import sample_ggx_ndf
    rng = np.random.default_rng(4)
    n = 1 << 16
    alpha = 0.5
    u2 = jnp.asarray(rng.random((n, 2), dtype=np.float32))
    m = np.asarray(sample_ggx_ndf(u2, jnp.float32(alpha)))
    cz = np.clip(m[:, 2], 1e-6, 1)
    t2 = (1 - cz ** 2) / cz ** 2
    g = t2 / (alpha * alpha + t2)
    phi = np.arctan2(m[:, 1], m[:, 0])
    k = 32
    c1 = np.histogram(g, bins=k, range=(0, 1))[0]
    c2 = np.histogram(phi, bins=k, range=(-np.pi, np.pi))[0]
    assert _chi2_uniform(c1) < 61.1
    assert _chi2_uniform(c2) < 61.1


def test_mc_estimator_mean_and_variance():
    """The cosine-hemisphere estimator of a known integral: E[f/pdf] with
    f = cos(theta)/pi over the hemisphere integrates any smooth g; check
    mean and that the sample variance shrinks ~1/N."""
    import numpy as np
    import jax.numpy as jnp
    from directcomputeraytracing_tpu.sampling.montecarlo import (
        cosine_sample_hemisphere,
    )
    rng = np.random.default_rng(5)
    n = 1 << 16
    u2 = jnp.asarray(rng.random((n, 2), dtype=np.float32))
    w = np.asarray(cosine_sample_hemisphere(u2))
    # integral of cos^2/pi over hemisphere = 2/3... using pdf = cos/pi:
    # E[cos] = int cos * cos/pi = 2/3
    est = w[:, 2]
    assert abs(est.mean() - 2.0 / 3.0) < 0.005
    half = est[: n // 2]
    assert abs(half.mean() - 2.0 / 3.0) < 0.01
