"""Kulla-Conty energy LUT baking by jitted Monte-Carlo integration.

TPU re-design of the reference's startup GPU bake
(reference: Source/BxDFTexturesBuilding.cpp:106-475 + the
Shaders/BxDFTexturesBuilding.hlsl INTEGRATE_COOKTORRANCE_BXDF /
INTEGRATE_AVERAGE kernels): for every LUT texel (cosThetaO, alpha[, eta,
side]) the directional albedo E = (1/N) sum f(wi,wo)|wi.z|/pdf is
estimated with VNDF importance sampling (the bake compiles with
GGX_SAMPLE_VNDF and, for the BSDF, REFRACTION_NO_SCALE_FACTOR —
BxDFTexturesBuilding.cpp:38,52), and Eavg = 2 * trapezoid(E(c) * c) over
the cos axis. Where the reference runs one thread per texel accumulating
in double across 5-24 batches of 4096 samples, here every texel of a LUT
integrates in lock-step as one big vectorized batch per chunk — sample
vectors are shared across texels exactly like the reference's
common-seeded per-texel RNG — with float32 chunk means averaged at the
end (numerically equivalent to the reference's double accumulate at
these sample counts).

Perfectly-smooth rows (alpha < ALPHA_THRESHOLD) take the reference's
delta-lobe path, which reduces to an analytic value (E=1, or the exact
Fresnel for the dielectric-weighted BRDF).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..bsdf.fresnel import fresnel_dielectric
from ..bsdf.ggx import (
    eval_ct_brdf,
    eval_ct_bsdf,
    pdf_ct_brdf,
    pdf_ct_bsdf,
    sample_ct_bsdf,
    sample_ggx_m,
)
from ..core.constants import ALPHA_THRESHOLD
from .textures import BxDFLuts

F32 = jnp.float32

# LUT dimensions (reference: Shaders/BxDFTextureDef.inc.hlsl:4-9)
BRDF_COS = 32
BRDF_ALPHA = 32
DIEL_COS = 32
DIEL_ALPHA = 16
DIEL_ETA = 16
ETA_START = 1.0
ETA_END = 3.0


def _axis(n, lo=0.0, hi=1.0):
    return jnp.linspace(lo, hi, n, dtype=F32)


def _wo_from_cos(cos_o):
    sin_o = jnp.sqrt(jnp.maximum(1.0 - cos_o * cos_o, 0.0))
    return jnp.stack([sin_o, jnp.zeros_like(cos_o), cos_o], axis=-1)


def _average(e):
    """Eavg = 2 * trapezoid(E(c) * c) dc over the last (cos) axis, matching
    the reference's composition (BxDFTexturesBuilding.hlsl INTEGRATE_AVERAGE:
    interior texels saturated and weighted by their cos, endpoint cos values
    0.0001 and 1)."""
    n = e.shape[-1] - 1
    cos = _axis(e.shape[-1])
    f = jnp.clip(e, 0.0, 1.0) * cos
    fa = e[..., 0] * 1e-4
    fb = e[..., -1]
    s = jnp.sum(f[..., 1:-1], axis=-1)
    return (s + 0.5 * (fa + fb)) * (2.0 / n)


@partial(jax.jit, static_argnames=("n_chunks", "chunk"))
def _bake_brdf(key, n_chunks, chunk):
    """E(cosTheta, alpha) for the Cook-Torrance BRDF -> (ALPHA, COS)."""
    cos_o = jnp.maximum(_axis(BRDF_COS), 1e-4)
    alpha = _axis(BRDF_ALPHA)
    a = alpha[:, None, None]                      # (A, 1, 1)
    wo = _wo_from_cos(cos_o)[None, :, None, :]    # (1, C, 1, 3)

    def body(k, acc):
        u2 = jax.random.uniform(jax.random.fold_in(key, k), (chunk, 2),
                                dtype=F32)[None, None]   # (1, 1, B, 2)
        m = sample_ggx_m(wo, u2, a, use_vndf=True)
        wi = 2.0 * jnp.sum(wo * m, -1, keepdims=True) * m - wo
        wo_dot_m = jnp.sum(wo * m, -1)
        val = eval_ct_brdf(wi, wo, a, m, wo_dot_m)
        pdf = pdf_ct_brdf(wi, wo, a, m, wo_dot_m, use_vndf=True)
        c = jnp.where(pdf > 0.0, val * jnp.abs(wi[..., 2])
                      / jnp.maximum(pdf, 1e-20), 0.0)
        return acc + jnp.mean(c, axis=-1)

    e = jax.lax.fori_loop(0, n_chunks, body,
                          jnp.zeros((BRDF_ALPHA, BRDF_COS), F32)) / n_chunks
    smooth = alpha < ALPHA_THRESHOLD
    return jnp.where(smooth[:, None], 1.0, e)


@partial(jax.jit, static_argnames=("n_chunks", "chunk", "is_bsdf"))
def _bake_dielectric(key, n_chunks, chunk, is_bsdf):
    """Fresnel-weighted BRDF (is_bsdf=False) or full BSDF (True) energy ->
    (2, ETA, ALPHA, COS); side 1 = 'entering' = wo inside the denser medium
    (eta_o=eta, eta_i=1), matching BxDFTexturesBuilding.cpp:284-308's slice
    order (leaving slices first)."""
    cos_o = jnp.maximum(_axis(DIEL_COS), 1e-4)
    alpha = _axis(DIEL_ALPHA)
    eta = _axis(DIEL_ETA, ETA_START, ETA_END)

    side = jnp.asarray([0.0, 1.0], F32)[:, None, None, None, None]
    et = eta[None, :, None, None, None]
    eta_o = jnp.where(side == 1.0, et, 1.0)[..., 0]   # (2, E, 1, 1)
    eta_i = jnp.where(side == 1.0, 1.0, et)[..., 0]
    a = alpha[None, None, :, None, None][..., 0]      # (1, 1, A, 1)
    wo = _wo_from_cos(cos_o)[None, None, None, :, None, :]  # (1,1,1,C,1,3)

    def body(k, acc):
        kk = jax.random.fold_in(key, k)
        u2 = jax.random.uniform(kk, (chunk, 2), dtype=F32)[
            None, None, None, None]                   # (1,1,1,1,B,2)
        if is_bsdf:
            u_sel = jax.random.uniform(jax.random.fold_in(kk, 7), (chunk,),
                                       dtype=F32)[None, None, None, None]
            wi, m, wo_dot_m = sample_ct_bsdf(
                wo, u_sel, u2, a[..., None], eta_o[..., None],
                eta_i[..., None], use_vndf=True)
            val = eval_ct_bsdf(wi, wo, a[..., None], eta_o[..., None],
                               eta_i[..., None], scale_factor=False)
            pdf = pdf_ct_bsdf(wi, wo, a[..., None], eta_o[..., None],
                              eta_i[..., None], use_vndf=True)
        else:
            m = sample_ggx_m(wo, u2, a[..., None], use_vndf=True)
            wi = 2.0 * jnp.sum(wo * m, -1, keepdims=True) * m - wo
            wo_dot_m = jnp.sum(wo * m, -1)
            val = eval_ct_brdf(wi, wo, a[..., None], m, wo_dot_m)
            val = val * fresnel_dielectric(wo_dot_m, eta_o[..., None],
                                           eta_i[..., None])
            pdf = pdf_ct_brdf(wi, wo, a[..., None], m, wo_dot_m,
                              use_vndf=True)
        c = jnp.where(pdf > 0.0, val * jnp.abs(wi[..., 2])
                      / jnp.maximum(pdf, 1e-20), 0.0)
        return acc + jnp.mean(c, axis=-1)

    e = jax.lax.fori_loop(
        0, n_chunks, body,
        jnp.zeros((2, DIEL_ETA, DIEL_ALPHA, DIEL_COS), F32)) / n_chunks

    # perfectly-smooth rows: delta lobes (reference's perfectSmooth branch)
    smooth = (alpha < ALPHA_THRESHOLD)[None, None, :, None]
    if is_bsdf:
        e_smooth = jnp.ones_like(e)   # F*1 + (1-F)*1, no-scale
    else:
        f = fresnel_dielectric(cos_o[None, None, None, :], eta_o, eta_i)
        e_smooth = jnp.broadcast_to(f, e.shape)
    return jnp.where(smooth, e_smooth, e)


def bake_luts_cached(seed=0, quality=1.0, cache_path=None):
    """bake_luts with a disk cache (the reference bakes at every startup
    because the GPU bake is ~instant; the jitted TPU bake pays tens of
    seconds of XLA compile through the device tunnel, so cache it)."""
    import os

    from .textures import load_luts, save_luts

    if cache_path is None:
        cache_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            f"_bxdf_luts_s{seed}_q{quality:g}.npz")
    if os.path.exists(cache_path):
        try:
            return load_luts(cache_path)
        except Exception:
            pass
    luts = bake_luts(seed=seed, quality=quality)
    try:
        save_luts(cache_path, luts)
    except OSError:
        pass
    return luts


def bake_luts(seed=0, quality=1.0):
    """Bake all six LUTs. quality scales sample counts (1.0 = the
    reference's 5x4096 / 5x4096 / 24x4096 batches)."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    n1 = max(1, round(5 * quality))
    n2 = max(1, round(20 * quality))
    n3 = max(1, round(96 * quality))
    brdf = _bake_brdf(k1, n1, 4096)
    diel = _bake_dielectric(k2, n2, 1024, is_bsdf=False)
    bsdf = _bake_dielectric(k3, n3, 1024, is_bsdf=True)
    return BxDFLuts(
        brdf=jnp.clip(brdf, 0.0, 1.0),
        brdf_avg=jnp.clip(_average(brdf), 0.0, 1.0),
        brdf_dielectric=jnp.clip(diel, 0.0, 1.0),
        brdf_dielectric_avg=jnp.clip(_average(diel), 0.0, 1.0),
        bsdf=jnp.clip(bsdf, 0.0, 1.0),
        bsdf_avg=jnp.clip(_average(bsdf), 0.0, 1.0),
    )
