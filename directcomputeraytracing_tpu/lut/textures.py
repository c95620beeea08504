"""Kulla-Conty energy-compensation LUT container and samplers.

The reference bakes six energy textures at startup
(reference: Source/BxDFTexturesBuilding.cpp:106-475, sampled via
Shaders/BxDFTextures.inc.hlsl). Here they are plain arrays in a NamedTuple
pytree, baked by `lut.bake` (pure jitted Monte-Carlo) and sampled with
clamped bilinear interpolation.

The reference remaps texcoords so u=0/1 land on texel centers and then
uses hardware bilinear; the composition simplifies to `pos = u * (dim-1)`
with a lerp between adjacent texels — implemented directly here.

Layouts (entering = from outside into the denser medium):
  brdf:            (A=32, C=32)           E(cosTheta, alpha)
  brdf_avg:        (A=32,)                Eavg(alpha)
  brdf_dielectric: (2, E=16, A=16, C=32)  [leave/enter, eta, alpha, cos]
  brdf_dielectric_avg: (2, E=16, A=16)
  bsdf:            (2, E=16, A=16, C=32)
  bsdf_avg:        (2, E=16, A=16)
eta axis spans [1, 3] via w = (eta - 1) / 2.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class BxDFLuts(NamedTuple):
    brdf: jnp.ndarray
    brdf_avg: jnp.ndarray
    brdf_dielectric: jnp.ndarray
    brdf_dielectric_avg: jnp.ndarray
    bsdf: jnp.ndarray
    bsdf_avg: jnp.ndarray


def placeholder_luts():
    """Unit-energy LUTs (E = 1 everywhere): multiscatter lobes vanish and
    the plastic specular weight degenerates gracefully. Used before the
    bake and in tests that do not exercise multiscattering."""
    return BxDFLuts(
        brdf=jnp.ones((32, 32), jnp.float32),
        brdf_avg=jnp.ones((32,), jnp.float32),
        brdf_dielectric=jnp.ones((2, 16, 16, 32), jnp.float32),
        brdf_dielectric_avg=jnp.ones((2, 16, 16), jnp.float32),
        bsdf=jnp.ones((2, 16, 16, 32), jnp.float32),
        bsdf_avg=jnp.ones((2, 16, 16), jnp.float32),
    )


def _lerp_axis(u, dim):
    """u in [0,1] -> (i0, i1, frac) sampling texel centers 0..dim-1."""
    pos = jnp.clip(u, 0.0, 1.0) * (dim - 1)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, dim - 1)
    return i0, i1, pos - i0.astype(pos.dtype)


def _sample_1d(tex, u):
    i0, i1, f = _lerp_axis(u, tex.shape[0])
    return tex[i0] * (1.0 - f) + tex[i1] * f


def _sample_2d(tex, uy, ux):
    """tex (Y, X); uy indexes axis 0, ux axis 1. Bilinear."""
    y0, y1, fy = _lerp_axis(uy, tex.shape[0])
    x0, x1, fx = _lerp_axis(ux, tex.shape[1])
    v00 = tex[y0, x0]
    v01 = tex[y0, x1]
    v10 = tex[y1, x0]
    v11 = tex[y1, x1]
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


def _sample_3d(tex, uz, uy, ux, entering):
    """tex (2, Z, Y, X); trilinear with the entering/leaving slice select."""
    side = jnp.asarray(entering, jnp.int32)
    z0, z1, fz = _lerp_axis(uz, tex.shape[1])
    y0, y1, fy = _lerp_axis(uy, tex.shape[2])
    x0, x1, fx = _lerp_axis(ux, tex.shape[3])

    def at(z, y, x):
        return tex[side, z, y, x]

    def bilin(z):
        return ((at(z, y0, x0) * (1 - fx) + at(z, y0, x1) * fx) * (1 - fy)
                + (at(z, y1, x0) * (1 - fx) + at(z, y1, x1) * fx) * fy)

    return bilin(z0) * (1 - fz) + bilin(z1) * fz


def _eta_coord(eta):
    return (eta - 1.0) * 0.5


def sample_brdf_energy(luts: BxDFLuts, cos_theta, alpha):
    """E(cosTheta, alpha) for the Cook-Torrance BRDF."""
    return _sample_2d(luts.brdf, alpha, cos_theta)


def sample_brdf_energy_avg(luts: BxDFLuts, alpha):
    return _sample_1d(luts.brdf_avg, alpha)


def sample_brdf_dielectric_energy(luts, cos_theta, alpha, eta, entering):
    return _sample_3d(luts.brdf_dielectric, _eta_coord(eta), alpha,
                      cos_theta, entering)


def sample_brdf_dielectric_energy_avg(luts, alpha, eta, entering):
    side = jnp.asarray(entering, jnp.int32)
    return _sample_2d_batched_side(luts.brdf_dielectric_avg, side,
                                   _eta_coord(eta), alpha)


def sample_bsdf_energy(luts, cos_theta, alpha, eta, entering):
    return _sample_3d(luts.bsdf, _eta_coord(eta), alpha, cos_theta, entering)


def sample_bsdf_energy_avg(luts, alpha, eta, entering):
    side = jnp.asarray(entering, jnp.int32)
    return _sample_2d_batched_side(luts.bsdf_avg, side, _eta_coord(eta),
                                   alpha)


def _sample_2d_batched_side(tex, side, uy, ux):
    """tex (2, Y, X) with per-element side select."""
    y0, y1, fy = _lerp_axis(uy, tex.shape[1])
    x0, x1, fx = _lerp_axis(ux, tex.shape[2])
    v00 = tex[side, y0, x0]
    v01 = tex[side, y0, x1]
    v10 = tex[side, y1, x0]
    v11 = tex[side, y1, x1]
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


def save_luts(path, luts: BxDFLuts):
    np.savez_compressed(path, **{k: np.asarray(v)
                                 for k, v in luts._asdict().items()})


def load_luts(path) -> BxDFLuts:
    data = np.load(path)
    return BxDFLuts(**{k: jnp.asarray(data[k]) for k in BxDFLuts._fields})
