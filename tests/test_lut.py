"""Energy-LUT bake regression tests: white-furnace / analytic checks.

The reference has no tests; these validate the bake the way SURVEY.md §4
prescribes — Kulla-Conty energy conservation properties:
  * E(cos, alpha=0) == 1 for the BRDF (perfect mirror loses nothing).
  * E decreases with roughness at grazing angles (single-scatter GGX
    loses energy to masking).
  * BSDF (reflect+refract, no radiance scale) energy stays close to 1
    for all alpha — the full dielectric scatter is energy-preserving.
  * The dielectric-weighted BRDF at alpha=0 equals exact Fresnel.
  * Eavg is the cosine-weighted average of E (recompute independently).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from directcomputeraytracing_tpu.bsdf.fresnel import fresnel_dielectric
from directcomputeraytracing_tpu.lut.bake import (
    _average, _bake_brdf, _bake_dielectric, bake_luts,
)


@pytest.fixture(scope="module")
def luts():
    return bake_luts(seed=1, quality=0.25)


def test_brdf_smooth_row_is_one(luts):
    np.testing.assert_allclose(np.asarray(luts.brdf)[0], 1.0, atol=1e-6)


def test_brdf_energy_below_one_and_decreasing(luts):
    e = np.asarray(luts.brdf)
    assert e.max() <= 1.0 + 1e-3
    # at near-grazing cos (col 3), energy drops as alpha rises
    assert e[-1, 3] < e[4, 3]
    # near-normal incidence, rough GGX single-scatter loses energy
    assert e[-1, -1] < 0.95


def test_bsdf_energy_near_one(luts):
    # full dielectric BSDF without radiance scale conserves energy to
    # within single-scatter loss; multiscatter compensation assumes
    # 1 - E is the multiple-scattering fraction, so E must be <= 1.
    e = np.asarray(luts.bsdf)
    assert e.max() <= 1.0 + 1e-3
    # smooth row exactly 1
    np.testing.assert_allclose(e[:, :, 0, :], 1.0, atol=1e-6)


def test_dielectric_brdf_smooth_is_fresnel(luts):
    e = np.asarray(luts.brdf_dielectric)
    cos = np.maximum(np.linspace(0, 1, 32, dtype=np.float32), 1e-4)
    eta = np.linspace(1, 3, 16, dtype=np.float32)
    for side in (0, 1):
        for ei in (3, 9):
            eta_o = eta[ei] if side == 1 else 1.0
            eta_i = 1.0 if side == 1 else eta[ei]
            f = np.asarray(fresnel_dielectric(
                jnp.asarray(cos), jnp.float32(eta_o), jnp.float32(eta_i)))
            np.testing.assert_allclose(e[side, ei, 0], f, atol=2e-3)


def test_average_matches_independent_trapezoid(luts):
    e = np.asarray(luts.brdf)
    n = e.shape[1] - 1
    cos = np.linspace(0, 1, e.shape[1])
    f = np.clip(e, 0, 1) * cos
    expected = (f[:, 1:-1].sum(1) + 0.5 * (e[:, 0] * 1e-4 + e[:, -1])) \
        * 2.0 / n
    np.testing.assert_allclose(np.asarray(luts.brdf_avg),
                               np.clip(expected, 0, 1), atol=1e-5)


def test_monte_carlo_consistency():
    # two independent bakes agree within MC noise
    import jax
    e1 = np.asarray(_bake_brdf(jax.random.PRNGKey(0), 2, 2048))
    e2 = np.asarray(_bake_brdf(jax.random.PRNGKey(9), 2, 2048))
    assert np.abs(e1 - e2).mean() < 0.01
