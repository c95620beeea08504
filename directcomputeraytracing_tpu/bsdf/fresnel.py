"""Fresnel terms (exact dielectric, exact conductor, Schlick).

Vectorized port of reference: Shaders/Fresnel.inc.hlsl. All functions are
elementwise over arbitrary batch shapes; `fresnel_conductor` broadcasts
over a trailing RGB axis.
"""

import jax.numpy as jnp

from ..sampling.montecarlo import safe_sqrt


def fresnel_dielectric(cos_theta_i, eta_o, eta_i):
    """Unpolarized dielectric Fresnel reflectance.

    Negative cos_theta_i means the ray is on the eta_i side (the media are
    swapped internally, like the reference does).
    """
    cos_i = jnp.clip(cos_theta_i, -1.0, 1.0)
    swap = cos_i < 0.0
    e_o = jnp.where(swap, eta_i, eta_o)
    e_i = jnp.where(swap, eta_o, eta_i)
    cos_i = jnp.abs(cos_i)

    sin_i = jnp.sqrt(jnp.maximum(1.0 - cos_i * cos_i, 0.0))
    sin_t = e_o / e_i * sin_i
    tir = sin_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t * sin_t, 0.0))
    r_parl = (e_i * cos_i - e_o * cos_t) / jnp.maximum(
        e_i * cos_i + e_o * cos_t, 1e-20)
    r_perp = (e_o * cos_i - e_i * cos_t) / jnp.maximum(
        e_o * cos_i + e_i * cos_t, 1e-20)
    f = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, 1.0, f)


def fresnel_conductor(cos_theta_i, eta_o, eta_i, k):
    """Exact conductor Fresnel; eta_i / k are (..., 3) RGB."""
    cos_i = jnp.clip(cos_theta_i, -1.0, 1.0)[..., None]
    eta = eta_i / eta_o
    etak = k / eta_o

    cos2 = cos_i * cos_i
    sin2 = 1.0 - cos2
    eta2 = eta * eta
    etak2 = etak * etak

    t0 = eta2 - etak2 - sin2
    a2b2 = safe_sqrt(t0 * t0 + 4.0 * eta2 * etak2)
    t1 = a2b2 + cos2
    a = safe_sqrt(0.5 * (a2b2 + t0))
    t2 = 2.0 * cos_i * a
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-20)

    t3 = cos2 * a2b2 + sin2 * sin2
    t4 = t2 * sin2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-20)
    return 0.5 * (rp + rs)


def fresnel_schlick(cos_theta_i, f0):
    cos_i = jnp.clip(cos_theta_i, -1.0, 1.0)
    a = 1.0 - cos_i
    a5 = (a * a) * (a * a) * a
    return f0 + (1.0 - f0) * a5[..., None] if f0.ndim > cos_i.ndim \
        else f0 + (1.0 - f0) * a5
