"""Perfect-specular delta lobes (mirror BRDF, smooth dielectric BSDF).

Vectorized port of reference: Shaders/SpecularBxDF.inc.hlsl. Delta lobes
have zero eval/pdf for arbitrary directions; sampling returns
(wi, value, pdf) where `value` already includes the 1/|cos| delta
normalization.
"""

import jax.numpy as jnp


from .fresnel import fresnel_dielectric


def sample_specular_brdf(wo):
    """Mirror reflection about +z. Returns (wi, value, pdf)."""
    wi = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)
    ok = wo[..., 2] > 0.0
    value = jnp.where(ok, 1.0 / jnp.maximum(wi[..., 2], 1e-20), 0.0)
    pdf = jnp.where(ok, 1.0, 0.0)
    return wi, value, pdf


def sample_specular_bsdf(wo, u_sel, eta_o, eta_i, is_thin):
    """Smooth dielectric: Fresnel-weighted reflect/refract delta lobes.

    `is_thin` (bool array) enables the thin-slab double-reflection
    correction F += T^2 F / (1 - F^2) and pass-through transmission
    (reference :61-65). Returns (wi, value, pdf).
    """
    is_thin = jnp.asarray(is_thin)
    f = fresnel_dielectric(wo[..., 2], eta_o, eta_i)
    t = 1.0 - f
    thin_f = jnp.where(
        f < 1.0, f + t * t * f / jnp.maximum(1.0 - f * f, 1e-20), f)
    f = jnp.where(is_thin, thin_f, f)
    t = 1.0 - f

    reflect = u_sel < f
    wi_refl = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)

    # full-vector refraction about +z (solid), pass-through (thin slab)
    eta_rel = eta_o / eta_i
    cos_i = wo[..., 2]
    sin2_t = eta_rel * eta_rel * jnp.maximum(1.0 - cos_i * cos_i, 0.0)
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    wi_refr_solid = jnp.stack(
        [-eta_rel * wo[..., 0], -eta_rel * wo[..., 1], -cos_t], axis=-1)
    wi_refr = jnp.where(is_thin[..., None], -wo, wi_refr_solid)

    wi = jnp.where(reflect[..., None], wi_refl, wi_refr)

    # radiance compression factor on refraction (reference's default path)
    scale = jnp.where(is_thin, 1.0, (eta_o * eta_o) / (eta_i * eta_i))
    val_refl = f / jnp.maximum(wi_refl[..., 2], 1e-20)
    val_refr = t * scale / jnp.maximum(-wi_refr[..., 2], 1e-20)
    value = jnp.where(reflect, val_refl, val_refr)
    pdf = jnp.where(reflect, f, t)

    bad = (wo[..., 2] <= 0.0) | (~reflect & (wi[..., 2] == 0.0))
    matched = eta_o == eta_i
    value = jnp.where(matched, 1.0 / jnp.maximum(wo[..., 2], 1e-20),
                      jnp.where(bad, 0.0, value))
    pdf = jnp.where(matched, 1.0, jnp.where(bad, 0.0, pdf))
    wi = jnp.where(matched[..., None], -wo,
                   jnp.where(bad[..., None], 0.0, wi))
    return wi, value, pdf
