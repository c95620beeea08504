"""GGX microfacet distribution + Cook-Torrance BRDF/BSDF (tangent space).

Vectorized port of reference: Shaders/CookTorranceBSDF.inc.hlsl — Smith
height-uncorrelated shadowing, classic-NDF and Heitz-VNDF sampling (the
reference's GGX_SAMPLE_VNDF compile switch becomes the `use_vndf` static
flag), reflection BRDF and refractive dielectric BSDF with the half-vector
Jacobians. Fresnel is applied by the dispatcher for the BRDF; the
dielectric BSDF applies exact dielectric Fresnel internally.
"""

import jax.numpy as jnp

from ..core.constants import PI
from .fresnel import fresnel_dielectric

F32 = jnp.float32


def _g1(alpha2, m, w):
    """Smith G1 for one direction (reference :13-29)."""
    consistent = jnp.sum(w * m, axis=-1) * w[..., 2] > 0.0
    ndw = jnp.abs(w[..., 2])
    denom = jnp.sqrt(alpha2 + (1.0 - alpha2) * ndw * ndw) + ndw
    return jnp.where(consistent, 2.0 * ndw / jnp.maximum(denom, 1e-20), 0.0)


def ggx_shadowing(wi, wo, m, alpha):
    a2 = alpha * alpha
    return _g1(a2, m, wi) * _g1(a2, m, wo)


def ggx_d(m, alpha):
    a2 = alpha * alpha
    ndm = m[..., 2]
    f = ndm * ndm * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(f * f * F32(PI), 1e-20)


def sample_ggx_ndf(u2, alpha):
    theta = jnp.arctan(alpha * jnp.sqrt(
        u2[..., 0] / jnp.maximum(1.0 - u2[..., 0], 1e-20)))
    phi = F32(2.0 * PI) * u2[..., 1]
    s = jnp.sin(theta)
    return jnp.stack(
        [jnp.cos(phi) * s, jnp.sin(phi) * s, jnp.cos(theta)], axis=-1)


def sample_ggx_vndf(wo, u2, alpha):
    """Heitz 2018 visible-NDF sampling (reference :45-67)."""
    z = jnp.broadcast_to(wo[..., 2], jnp.broadcast_shapes(
        wo[..., 2].shape, jnp.shape(alpha)))
    vh = jnp.stack([alpha * wo[..., 0], alpha * wo[..., 1], z], axis=-1)
    vh = vh / jnp.maximum(jnp.linalg.norm(vh, axis=-1, keepdims=True), 1e-20)
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where(
        (lensq > 0.0)[..., None],
        jnp.stack([-vh[..., 1] * inv_len, vh[..., 0] * inv_len,
                   jnp.zeros_like(inv_len)], axis=-1),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], F32), vh.shape),
    )
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(u2[..., 0])
    phi = F32(2.0 * PI) * u2[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    nh = (p1[..., None] * t1 + p2[..., None] * t2
          + jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))[..., None]
          * vh)
    ne = jnp.stack([alpha * nh[..., 0], alpha * nh[..., 1],
                    jnp.maximum(nh[..., 2], 0.0)], axis=-1)
    return ne / jnp.maximum(jnp.linalg.norm(ne, axis=-1, keepdims=True),
                            1e-20)


def ggx_pdf_m(wo, m, alpha, use_vndf):
    """pdf of sampling microfacet normal m (reference :79-86)."""
    if use_vndf:
        return (ggx_d(m, alpha)
                * _g1(alpha * alpha, m, wo)
                * jnp.maximum(jnp.sum(wo * m, axis=-1), 0.0)
                / jnp.maximum(wo[..., 2], 1e-20))
    return ggx_d(m, alpha) * jnp.abs(m[..., 2])


def sample_ggx_m(wo, u2, alpha, use_vndf):
    return sample_ggx_vndf(wo, u2, alpha) if use_vndf \
        else sample_ggx_ndf(u2, alpha)


# ---------------------------------------------------------------------------
# Cook-Torrance microfacet BRDF (reflection only; Fresnel applied by caller)
# ---------------------------------------------------------------------------

def eval_ct_brdf(wi, wo, alpha, m, wo_dot_m):
    valid = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0) & (wo_dot_m > 0.0) \
        & (jnp.sum(jnp.abs(m), axis=-1) > 0.0)
    v = ggx_d(m, alpha) * ggx_shadowing(wi, wo, m, alpha) / jnp.maximum(
        4.0 * wi[..., 2] * wo[..., 2], 1e-20)
    return jnp.where(valid, v, 0.0)


def pdf_ct_brdf(wi, wo, alpha, m, wo_dot_m, use_vndf):
    valid = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0) & (wo_dot_m > 0.0)
    pdf = ggx_pdf_m(wo, m, alpha, use_vndf) / jnp.maximum(
        4.0 * wo_dot_m, 1e-20)
    return jnp.where(valid, pdf, 0.0)


def sample_ct_brdf(wo, u2, alpha, use_vndf):
    """Returns (wi, m). wi = reflect(wo about m)."""
    m = sample_ggx_m(wo, u2, alpha, use_vndf)
    wi = 2.0 * jnp.sum(wo * m, axis=-1, keepdims=True) * m - wo
    return wi, m


# ---------------------------------------------------------------------------
# Cook-Torrance microfacet BSDF (reflection + refraction, dielectric)
# ---------------------------------------------------------------------------

def _half_vector(wi, wo, eta_o, eta_i):
    reflect = (wi[..., 2] * wo[..., 2]) > 0.0
    scale_o = jnp.where(reflect, 1.0, eta_o)
    scale_i = jnp.where(reflect, 1.0, eta_i)
    m = wo * scale_o[..., None] + wi * scale_i[..., None]
    m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-20)
    m = jnp.where((m[..., 2] < 0.0)[..., None], -m, m)
    return m, reflect


def eval_ct_bsdf(wi, wo, alpha, eta_o, eta_i, scale_factor=True):
    """scale_factor=False drops the (eta_o/eta_i)^2 radiance compression on
    refraction (the reference's REFRACTION_NO_SCALE_FACTOR define, set only
    for the energy-LUT bake)."""
    active = (wo[..., 2] != 0.0) & (wi[..., 2] != 0.0)
    m, reflect = _half_vector(wi, wo, eta_o, eta_i)
    wi_dot_m = jnp.sum(wi * m, axis=-1)
    wo_dot_m = jnp.sum(wo * m, axis=-1)

    d = ggx_d(m, alpha)
    f = fresnel_dielectric(wo_dot_m, eta_o, eta_i)
    g = ggx_shadowing(wi, wo, m, alpha)

    refl_v = f * d * g / jnp.maximum(
        4.0 * jnp.abs(wi[..., 2]) * jnp.abs(wo[..., 2]), 1e-20)

    sqrt_denom = eta_o * wo_dot_m + eta_i * wi_dot_m
    eta_num = eta_o * eta_o if scale_factor else eta_i * eta_i
    refr_v = (1.0 - f) * jnp.abs(
        d * g * jnp.abs(wi_dot_m) * jnp.abs(wo_dot_m) * eta_num
        / jnp.maximum(jnp.abs(wi[..., 2] * wo[..., 2] * sqrt_denom
                              * sqrt_denom), 1e-20))
    # restore the sign convention of the reference (value uses the product
    # in the denominator; it is positive for transmission configurations)
    v = jnp.where(reflect, refl_v, refr_v)
    return jnp.where(active, v, 0.0)


def pdf_ct_bsdf(wi, wo, alpha, eta_o, eta_i, use_vndf):
    active = (wo[..., 2] != 0.0) & (wi[..., 2] != 0.0)
    m, reflect = _half_vector(wi, wo, eta_o, eta_i)
    wi_dot_m = jnp.sum(wi * m, axis=-1)
    wo_dot_m = jnp.sum(wo * m, axis=-1)
    active = active & (wi_dot_m * wi[..., 2] > 0.0) \
        & (wo_dot_m * wo[..., 2] > 0.0)

    sqrt_denom = eta_o * wo_dot_m + eta_i * wi_dot_m
    dwh_dwi = jnp.where(
        reflect,
        1.0 / jnp.maximum(4.0 * jnp.abs(wi_dot_m), 1e-20),
        jnp.abs(eta_i * eta_i * wi_dot_m)
        / jnp.maximum(sqrt_denom * sqrt_denom, 1e-20),
    )
    pdf = ggx_pdf_m(wo, m, alpha, use_vndf)
    f = fresnel_dielectric(wo_dot_m, eta_o, eta_i)
    pdf = pdf * jnp.where(reflect, f, 1.0 - f) * dwh_dwi
    return jnp.where(active, pdf, 0.0)


def _refract(w, m, eta_rel):
    """Refract direction -w about m with relative IOR eta_rel = eta_o/eta_i.

    Matches HLSL refract(i, n, eta): i is the incident direction pointing
    toward the surface.
    """
    i = -w
    cos_i = -jnp.sum(i * m, axis=-1)
    sin2_t = eta_rel * eta_rel * jnp.maximum(1.0 - cos_i * cos_i, 0.0)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    t = eta_rel[..., None] * i + (eta_rel * cos_i - cos_t)[..., None] * m
    return jnp.where(tir[..., None], 0.0, t)


def sample_ct_bsdf(wo, u_sel, u2, alpha, eta_o, eta_i, use_vndf):
    """Returns (wi, m, wo_dot_m). Selection sample picks reflect/refract by
    exact Fresnel (reference :222-256)."""
    m = sample_ggx_m(wo, u2, alpha, use_vndf)
    wo_dot_m = jnp.sum(wo * m, axis=-1)
    f = fresnel_dielectric(wo_dot_m, eta_o, eta_i)
    reflect = u_sel < f
    wi_refl = 2.0 * wo_dot_m[..., None] * m - wo
    wi_refr = _refract(wo, m, eta_o / eta_i)
    wi = jnp.where(reflect[..., None], wi_refl, wi_refr)
    bad = (wo[..., 2] == 0.0) | (wo_dot_m <= 0.0)
    wi = jnp.where(bad[..., None], 0.0, wi)
    # index-matched media pass straight through
    matched = eta_o == eta_i
    wi = jnp.where(matched[..., None], -wo, wi)
    return wi, m, wo_dot_m
