"""Material dispatch: evaluate / pdf / sample over a heterogeneous ray batch.

Re-design of the reference's per-thread branching BSDF composition
(reference: Shaders/BSDFs.inc.hlsl:42-505) for the TPU vector model: every
lobe is evaluated for the whole batch and blended with `jnp.where` masks.
With five material types sharing most of the lobe math, the redundant VPU
work is small and the result is fully fusible by XLA.

Lobe composition per material type (identical to the reference):
  Diffuse         Lambert
  Plastic         Lambert + CT-GGX with dielectric Fresnel (+ KC
                  multiscatter), specular weight from the dielectric
                  energy LUT, internal-scattering factor on the substrate
  Conductor       CT-GGX with conductor Fresnel (+ KC multiscatter,
                  0.5/0.5 lobe selection)
  Dielectric      CT-GGX refractive BSDF (+ KC reciprocal multiscatter);
                  perfect-smooth alpha falls back to the delta BSDF
  ThinDielectric  delta reflect/pass-through with thin-slab Fresnel

All directions are world-space at the interface; tangent-frame transforms
and the hemisphere inversion (wo below the shading normal) are handled
here, exactly like the reference.
"""

import jax.numpy as jnp

from ..core.constants import (
    ALPHA_THRESHOLD,
    INTERNAL_SCATTERING_MODE_IGNORE,
    INTERNAL_SCATTERING_MODE_MULTIPLE,
    MATERIAL_TYPE_CONDUCTOR,
    MATERIAL_TYPE_DIELECTRIC,
    MATERIAL_TYPE_DIFFUSE,
    MATERIAL_TYPE_PLASTIC,
    MATERIAL_TYPE_THIN_DIELECTRIC,
)
from ..lut.textures import (
    sample_brdf_dielectric_energy,
    sample_brdf_dielectric_energy_avg,
    sample_brdf_energy,
    sample_brdf_energy_avg,
    sample_bsdf_energy,
    sample_bsdf_energy_avg,
)
from . import ggx, kullaconty as kc, lambert, specular
from .fresnel import fresnel_conductor, fresnel_dielectric


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def _to_tbn(v, t, b, n):
    return jnp.stack(
        [jnp.sum(v * t, -1), jnp.sum(v * b, -1), jnp.sum(v * n, -1)], axis=-1)


def _from_tbn(v, t, b, n):
    return v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n


def _frame(itx):
    b = jnp.cross(itx.normal, itx.tangent)
    return itx.tangent, b, itx.normal


def _half(wo, wi):
    h = wo + wi
    zero = jnp.sum(jnp.abs(h), axis=-1) == 0.0
    h = jnp.where(zero[..., None], 0.0, _normalize(h))
    return h


def _specular_weight(luts, cos_theta, alpha, ior):
    """Plastic CT-lobe selection weight (reference BSDFs.inc.hlsl:14-17)."""
    return sample_brdf_dielectric_energy(luts, cos_theta, alpha, ior, False)


def _internal_scattering_factor(luts, alpha, albedo, ior, mode):
    avg_r = sample_brdf_dielectric_energy_avg(luts, alpha, ior, True)
    factor = (1.0 - avg_r)[..., None] / jnp.where(
        (mode == INTERNAL_SCATTERING_MODE_MULTIPLE)[..., None],
        jnp.maximum(1.0 - albedo * avg_r[..., None], 1e-20), 1.0)
    return jnp.where((mode == INTERNAL_SCATTERING_MODE_IGNORE)[..., None],
                     1.0, factor)


def _category_a_lobes(luts, itx, wo, inverted, smooth):
    """Shared lobe masks & weights for non-dielectric types.

    Returns dict with masks has_lambert/has_ct/has_ms, weights, F_ms,
    energies and internal scattering factor. `for_sample` differences are
    handled by callers.
    """
    mt = itx.material_type
    is_diffuse = mt == MATERIAL_TYPE_DIFFUSE
    is_plastic = mt == MATERIAL_TYPE_PLASTIC
    is_conductor = mt == MATERIAL_TYPE_CONDUCTOR
    has_any = ~inverted | itx.is_two_sided
    cos_o = wo[..., 2]

    e = sample_brdf_energy(luts, cos_o, itx.alpha)
    e_avg = sample_brdf_energy_avg(luts, itx.alpha)

    ms_plastic = itx.multiscattering & is_plastic & has_any & ~smooth
    ms_conductor = itx.multiscattering & is_conductor & has_any & ~smooth

    f_ms_plastic = kc.multiscatter_fresnel(
        e_avg, kc.favg_dielectric(itx.ior[..., 0]))
    f_ms_conductor = kc.multiscatter_fresnel(
        e_avg, kc.favg_conductor(itx.ior, itx.albedo))
    f_ms = jnp.where(is_plastic[..., None],
                     f_ms_plastic[..., None],
                     f_ms_conductor)

    w_ct_plastic = _specular_weight(luts, cos_o, itx.alpha, itx.ior[..., 0])
    w_ms_plastic = jnp.where(ms_plastic, f_ms_plastic * (1.0 - e), 0.0)
    w_l_plastic = jnp.maximum(1.0 - w_ct_plastic - w_ms_plastic, 0.0)

    w_ct = jnp.where(is_plastic, w_ct_plastic,
                     jnp.where(is_conductor,
                               jnp.where(ms_conductor, 0.5, 1.0), 0.0))
    w_ms = jnp.where(is_plastic, w_ms_plastic,
                     jnp.where(ms_conductor, 0.5, 0.0))
    w_l = jnp.where(is_diffuse, 1.0, jnp.where(is_plastic, w_l_plastic, 0.0))

    return dict(
        is_diffuse=is_diffuse, is_plastic=is_plastic,
        is_conductor=is_conductor, has_any=has_any,
        e=e, e_avg=e_avg, f_ms=f_ms,
        w_l=w_l, w_ct=w_ct, w_ms=w_ms,
        ms_plastic=ms_plastic, ms_conductor=ms_conductor,
    )


def _dielectric_ms_terms(luts, itx, cos_o, inverted):
    """Shared Kulla-Conty terms for the rough dielectric BSDF."""
    ior = itx.ior[..., 0]
    e_avg_enter = sample_bsdf_energy_avg(luts, itx.alpha, ior, True)
    f_avg_enter = kc.favg_dielectric(1.0 / ior)
    e_avg_leave = sample_bsdf_energy_avg(luts, itx.alpha, ior, False)
    f_avg_leave = kc.favg_dielectric(ior)
    recip = kc.reciprocal_factor(
        f_avg_leave, f_avg_enter, e_avg_leave, e_avg_enter, ior)
    e = sample_bsdf_energy(luts, cos_o, itx.alpha, ior, inverted)
    f_avg = jnp.where(inverted, f_avg_enter, f_avg_leave)
    e_avg = jnp.where(inverted, e_avg_enter, e_avg_leave)
    e_inv_avg = jnp.where(inverted, e_avg_leave, e_avg_enter)
    ratio = jnp.where(inverted, 1.0 - recip, recip) * (1.0 - f_avg)
    return e, e_avg, e_inv_avg, ratio


def _ct_fresnel(itx, wo_dot_h, dielectric_mask):
    f_d = fresnel_dielectric(wo_dot_h, 1.0, itx.ior[..., 0])[..., None]
    f_c = fresnel_conductor(wo_dot_h, 1.0, itx.ior, itx.albedo)
    return jnp.where(dielectric_mask[..., None], f_d, f_c)


def evaluate_bsdf(luts, wi_w, wo_w, itx, use_vndf=True):
    """f(wi, wo): (R, 3). Delta lobes contribute zero."""
    t, b, n = _frame(itx)
    wo = _to_tbn(wo_w, t, b, n)
    wi = _to_tbn(wi_w, t, b, n)
    inverted = wo[..., 2] < 0.0
    flip = jnp.where(inverted, -1.0, 1.0)
    wo = wo.at[..., 2].mul(flip)
    wi = wi.at[..., 2].mul(flip)
    cos_o = wo[..., 2]
    smooth = itx.alpha < ALPHA_THRESHOLD
    mt = itx.material_type
    is_dielectric = (mt == MATERIAL_TYPE_DIELECTRIC)
    is_thin = (mt == MATERIAL_TYPE_THIN_DIELECTRIC)
    cat_a = ~is_dielectric & ~is_thin

    # ---- category A: reflection lobes
    lob = _category_a_lobes(luts, itx, wo, inverted, smooth)
    h = _half(wo, wi)
    wo_dot_h = jnp.sum(h * wo, axis=-1)

    ratio_l = jnp.where(lob["is_diffuse"], 1.0, lob["w_l"])
    internal = _internal_scattering_factor(
        luts, itx.alpha, itx.albedo, itx.ior[..., 0], itx.internal_mode)
    has_lambert = (lob["is_diffuse"] | lob["is_plastic"]) & lob["has_any"]
    v_lambert = (lambert.eval_lambert(wi, wo) * ratio_l)[..., None] \
        * itx.albedo * jnp.where(lob["is_plastic"][..., None], internal, 1.0)

    has_ct = ((lob["is_plastic"] | lob["is_conductor"]) & lob["has_any"]
              & ~smooth)
    v_ct = ggx.eval_ct_brdf(wi, wo, itx.alpha, h, wo_dot_h)[..., None] \
        * _ct_fresnel(itx, wo_dot_h, lob["is_plastic"])

    has_ms = lob["ms_plastic"] | lob["ms_conductor"]
    v_ms = kc.eval_ms_brdf(luts, wi, wo, itx.alpha, lob["e"], lob["e_avg"],
                           lob["f_ms"])

    value_a = (jnp.where(has_lambert[..., None], v_lambert, 0.0)
               + jnp.where(has_ct[..., None], v_ct, 0.0)
               + jnp.where(has_ms[..., None], v_ms, 0.0))

    # ---- category B: rough dielectric BSDF
    ior = itx.ior[..., 0]
    eta_o = jnp.where(inverted, ior, 1.0)
    eta_i = jnp.where(inverted, 1.0, ior)
    v_b = ggx.eval_ct_bsdf(wi, wo, itx.alpha, eta_o, eta_i)
    e_d, e_avg_d, e_inv_avg_d, ratio_d = _dielectric_ms_terms(
        luts, itx, cos_o, inverted)
    v_b_ms = kc.eval_ms_bsdf(luts, wi, itx.alpha, ratio_d, ior, e_d,
                             e_avg_d, e_inv_avg_d, inverted)
    v_b = v_b + jnp.where(itx.multiscattering, v_b_ms, 0.0)
    value_b = jnp.where((is_dielectric & ~smooth)[..., None],
                        v_b[..., None], 0.0)

    return jnp.where(cat_a[..., None], value_a, value_b)


def evaluate_bsdf_pdf(luts, wi_w, wo_w, itx, use_vndf=True):
    """Sampling pdf of wi given wo: (R,)."""
    t, b, n = _frame(itx)
    wo = _to_tbn(wo_w, t, b, n)
    wi = _to_tbn(wi_w, t, b, n)
    inverted = wo[..., 2] < 0.0
    flip = jnp.where(inverted, -1.0, 1.0)
    wo = wo.at[..., 2].mul(flip)
    wi = wi.at[..., 2].mul(flip)
    cos_o = wo[..., 2]
    smooth = itx.alpha < ALPHA_THRESHOLD
    mt = itx.material_type
    is_dielectric = mt == MATERIAL_TYPE_DIELECTRIC
    is_thin = mt == MATERIAL_TYPE_THIN_DIELECTRIC
    cat_a = ~is_dielectric & ~is_thin

    lob = _category_a_lobes(luts, itx, wo, inverted, smooth)
    h = _half(wo, wi)
    wo_dot_h = jnp.sum(h * wo, axis=-1)

    has_lambert = (lob["is_diffuse"] | lob["is_plastic"]) & lob["has_any"]
    has_ct = ((lob["is_plastic"] | lob["is_conductor"]) & lob["has_any"]
              & ~smooth)
    has_ms = lob["ms_plastic"] | lob["ms_conductor"]

    pdf_a = (jnp.where(has_lambert,
                       lambert.pdf_lambert(wi, wo) * lob["w_l"], 0.0)
             + jnp.where(has_ct,
                         ggx.pdf_ct_brdf(wi, wo, itx.alpha, h, wo_dot_h,
                                         use_vndf) * lob["w_ct"], 0.0)
             + jnp.where(has_ms, kc.pdf_ms_brdf(wi, wo) * lob["w_ms"], 0.0))

    ior = itx.ior[..., 0]
    eta_o = jnp.where(inverted, ior, 1.0)
    eta_i = jnp.where(inverted, 1.0, ior)
    e_d, _, _, ratio_d = _dielectric_ms_terms(luts, itx, cos_o, inverted)
    w_bsdf = jnp.where(itx.multiscattering, e_d, 1.0)
    w_ms = jnp.where(itx.multiscattering, 1.0 - e_d, 0.0)
    pdf_b = ggx.pdf_ct_bsdf(wi, wo, itx.alpha, eta_o, eta_i,
                            use_vndf) * w_bsdf \
        + kc.pdf_ms_bsdf(wi, ratio_d) * w_ms
    pdf_b = jnp.where(is_dielectric & ~smooth, pdf_b, 0.0)

    return jnp.where(cat_a, pdf_a, pdf_b)


def sample_bsdf(luts, wo_w, u2, u_sel, itx, use_vndf=True):
    """Sample wi given wo. Returns (wi_w (R,3), value (R,3), pdf (R,),
    is_delta (R,) bool). Consumes exactly (u_sel, u2) like the reference
    (selection sample reused for Fresnel lobe choice inside the rough
    dielectric, matching BSDFs.inc.hlsl:455-460)."""
    t, b, n = _frame(itx)
    wo = _to_tbn(wo_w, t, b, n)
    inverted = wo[..., 2] < 0.0
    flip = jnp.where(inverted, -1.0, 1.0)
    wo = wo.at[..., 2].mul(flip)
    cos_o = wo[..., 2]
    smooth = itx.alpha < ALPHA_THRESHOLD
    mt = itx.material_type
    is_dielectric = mt == MATERIAL_TYPE_DIELECTRIC
    is_thin = mt == MATERIAL_TYPE_THIN_DIELECTRIC
    cat_a = ~is_dielectric & ~is_thin
    cat_c = is_thin | (is_dielectric & smooth)   # delta BSDF
    cat_b = is_dielectric & ~smooth

    # =========== category A ===========
    lob = _category_a_lobes(luts, itx, wo, inverted, smooth)
    w_l, w_ct, w_ms = lob["w_l"], lob["w_ct"], lob["w_ms"]
    pick_l = u_sel < w_l
    pick_ct = ~pick_l & (u_sel < w_l + w_ct)
    pick_ms = ~pick_l & ~pick_ct

    wi_l = lambert.sample_lambert(wo, u2)
    wi_ct, m_ct = ggx.sample_ct_brdf(wo, u2, itx.alpha, use_vndf)
    wi_spec, v_spec, p_spec = specular.sample_specular_brdf(wo)
    wi_ms = kc.sample_ms_brdf(wo, u2)

    delta_a = pick_ct & smooth
    wi_a = jnp.where(pick_l[..., None], wi_l,
                     jnp.where(pick_ct[..., None],
                               jnp.where(smooth[..., None], wi_spec, wi_ct),
                               wi_ms))
    h = jnp.where((pick_ct & ~smooth)[..., None], m_ct, _half(wo, wi_a))
    h = jnp.where(delta_a[..., None],
                  jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), h.shape), h)
    wo_dot_h = jnp.where(delta_a, cos_o, jnp.sum(h * wo, axis=-1))

    has_lambert = (lob["is_diffuse"] | lob["is_plastic"]) & lob["has_any"] \
        & ~delta_a
    has_ct = ((lob["is_plastic"] | lob["is_conductor"]) & lob["has_any"]
              & ~smooth & ~delta_a)
    has_ms = (lob["ms_plastic"] | lob["ms_conductor"]) & ~delta_a

    internal = _internal_scattering_factor(
        luts, itx.alpha, itx.albedo, itx.ior[..., 0], itx.internal_mode)
    v_lambert = (lambert.eval_lambert(wi_a, wo) * w_l)[..., None] \
        * itx.albedo * jnp.where(lob["is_plastic"][..., None], internal, 1.0)
    fres = _ct_fresnel(itx, wo_dot_h, lob["is_plastic"])
    v_ct = ggx.eval_ct_brdf(wi_a, wo, itx.alpha, h, wo_dot_h)[..., None] \
        * fres
    v_ms = kc.eval_ms_brdf(luts, wi_a, wo, itx.alpha, lob["e"],
                           lob["e_avg"], lob["f_ms"])

    value_a = (jnp.where(has_lambert[..., None], v_lambert, 0.0)
               + jnp.where(has_ct[..., None], v_ct, 0.0)
               + jnp.where(has_ms[..., None], v_ms, 0.0))
    pdf_a = (jnp.where(has_lambert,
                       lambert.pdf_lambert(wi_a, wo) * w_l, 0.0)
             + jnp.where(has_ct,
                         ggx.pdf_ct_brdf(wi_a, wo, itx.alpha, h, wo_dot_h,
                                         use_vndf) * w_ct, 0.0)
             + jnp.where(has_ms, kc.pdf_ms_brdf(wi_a, wo) * w_ms, 0.0))
    # delta reflection (smooth CT pick)
    value_a = jnp.where(delta_a[..., None], v_spec[..., None] * fres,
                        value_a)
    pdf_a = jnp.where(delta_a, p_spec * w_ct, pdf_a)

    # =========== category C: delta dielectric ===========
    ior = itx.ior[..., 0]
    entering_c = jnp.where(is_thin, False, inverted)
    eta_o_c = jnp.where(entering_c, ior, 1.0)
    eta_i_c = jnp.where(entering_c, 1.0, ior)
    wi_c, v_c, p_c = specular.sample_specular_bsdf(
        wo, u_sel, eta_o_c, eta_i_c, is_thin)

    # =========== category B: rough dielectric ===========
    eta_o = jnp.where(inverted, ior, 1.0)
    eta_i = jnp.where(inverted, 1.0, ior)
    e_d, e_avg_d, e_inv_avg_d, ratio_d = _dielectric_ms_terms(
        luts, itx, cos_o, inverted)
    w_bsdf = jnp.where(itx.multiscattering, e_d, 1.0)
    w_msb = jnp.where(itx.multiscattering, 1.0 - e_d, 0.0)
    pick_bsdf = u_sel < w_bsdf
    wi_bs, _, _ = ggx.sample_ct_bsdf(wo, u_sel, u2, itx.alpha, eta_o,
                                     eta_i, use_vndf)
    wi_msb = kc.sample_ms_bsdf(wo, u_sel, u2, ratio_d)
    wi_b = jnp.where(pick_bsdf[..., None], wi_bs, wi_msb)
    v_b = ggx.eval_ct_bsdf(wi_b, wo, itx.alpha, eta_o, eta_i) \
        + jnp.where(itx.multiscattering,
                    kc.eval_ms_bsdf(luts, wi_b, itx.alpha, ratio_d, ior,
                                    e_d, e_avg_d, e_inv_avg_d, inverted),
                    0.0)
    p_b = ggx.pdf_ct_bsdf(wi_b, wo, itx.alpha, eta_o, eta_i,
                          use_vndf) * w_bsdf \
        + jnp.where(itx.multiscattering,
                    kc.pdf_ms_bsdf(wi_b, ratio_d) * w_msb, 0.0)

    # =========== combine ===========
    wi = jnp.where(cat_a[..., None], wi_a,
                   jnp.where(cat_c[..., None], wi_c, wi_b))
    value = jnp.where(cat_a[..., None], value_a,
                      jnp.where(cat_c[..., None], v_c[..., None],
                                v_b[..., None]))
    pdf = jnp.where(cat_a, pdf_a, jnp.where(cat_c, p_c, p_b))
    is_delta = jnp.where(cat_a, delta_a, cat_c)

    wi = wi.at[..., 2].mul(flip)
    wi_w = _from_tbn(wi, t, b, n)
    return wi_w, value, pdf, is_delta
