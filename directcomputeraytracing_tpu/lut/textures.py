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


def _lerp_weights(u, dim):
    """u in [0,1] -> (R, dim) linear-interpolation weight rows (two
    nonzeros per row).

    TPU note: gathers pay a large fixed per-op cost regardless of table
    size, and the BxDF dispatch samples LUTs dozens of times per bounce —
    measured, corner-gather bilinear made `sample_bsdf` ~60 ms at 65k
    rays. Weight-matrix contraction replaces every gather with small
    matmul/elementwise passes that ride the MXU/VPU."""
    pos = jnp.clip(u, 0.0, 1.0) * (dim - 1)
    i0 = jnp.floor(pos)
    f = (pos - i0)[..., None]
    lane = jnp.arange(dim, dtype=pos.dtype)
    d0 = lane[None, :] - i0[..., None]          # 0 where lane == i0
    w = jnp.where(d0 == 0.0, 1.0 - f, 0.0) + jnp.where(d0 == 1.0, f, 0.0)
    # clamp at the top texel: i1 collapses onto i0
    top = i0[..., None] == (dim - 1)
    return jnp.where(top & (d0 == 0.0), 1.0, w)


def _sample_1d(tex, u):
    w = _lerp_weights(u, tex.shape[0])
    return w @ tex


def _sample_2d(tex, uy, ux):
    """tex (Y, X); uy indexes axis 0, ux axis 1. Bilinear via weight
    contraction (no gathers)."""
    wy = _lerp_weights(uy, tex.shape[0])           # (R, Y)
    wx = _lerp_weights(ux, tex.shape[1])           # (R, X)
    rows = wy @ tex                                # (R, X)
    return jnp.sum(rows * wx, axis=-1)


def _sample_3d(tex, uz, uy, ux, entering):
    """tex (2, Z, Y, X); trilinear + entering/leaving slice select, all
    as weight contractions."""
    side = jnp.asarray(entering, jnp.bool_)
    z, y, x = tex.shape[1:]
    wz = _lerp_weights(uz, z)                      # (R, Z)
    wy = _lerp_weights(uy, y)                      # (R, Y)
    wx = _lerp_weights(ux, x)                      # (R, X)

    def one_side(t):
        a = (wz @ t.reshape(z, y * x)).reshape(-1, y, x)   # (R, Y, X)
        b = jnp.sum(a * wy[:, :, None], axis=1)            # (R, X)
        return jnp.sum(b * wx, axis=-1)

    return jnp.where(side, one_side(tex[1]), one_side(tex[0]))


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
    """tex (2, Y, X) with per-element side select (weight contraction)."""
    side_b = jnp.asarray(side, jnp.bool_)
    return jnp.where(side_b, _sample_2d(tex[1], uy, ux),
                     _sample_2d(tex[0], uy, ux))


def save_luts(path, luts: BxDFLuts):
    np.savez_compressed(path, **{k: np.asarray(v)
                                 for k, v in luts._asdict().items()})


def load_luts(path) -> BxDFLuts:
    data = np.load(path)
    return BxDFLuts(**{k: jnp.asarray(data[k]) for k in BxDFLuts._fields})
