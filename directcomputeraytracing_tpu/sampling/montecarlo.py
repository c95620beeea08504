"""Vectorized Monte-Carlo sampling primitives.

Branch-free `jnp.where` re-formulations of the reference's scalar sampling
routines (reference: Shaders/MonteCarlo.inc.hlsl) — the HLSL versions
branch per thread; on TPU the whole ray batch evaluates every branch and
selects, which is the idiomatic (and on a VPU, equally cheap) formulation.

All functions take `u` sample arrays with the sample dimension last and are
shape-polymorphic over leading batch dims.
"""

import jax.numpy as jnp

from ..core.constants import PI

F32 = jnp.float32


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def concentric_sample_disk(u):
    """Map [0,1)^2 -> unit disk, concentric (area preserving).

    Matches the reference's 8-sector formulation
    (Shaders/MonteCarlo.inc.hlsl:6-45) so sample streams line up.
    u: (..., 2) -> (..., 2)
    """
    s = 2.0 * u - 1.0
    sx = s[..., 0]
    sy = s[..., 1]

    c_right = sx >= -sy          # sectors 1..4 vs 5..8
    c_rt = sx > sy               # within right half: bottom-right vs top
    c_lb = sx <= sy              # within left half

    r = jnp.where(
        c_right,
        jnp.where(c_rt, sx, sy),
        jnp.where(c_lb, -sx, -sy),
    )
    r_safe = jnp.where(r == 0.0, 1.0, r)
    theta = jnp.where(
        c_right,
        jnp.where(
            c_rt,
            jnp.where(sy > 0.0, sy / r_safe, 8.0 + sy / r_safe),
            2.0 - sx / r_safe,
        ),
        jnp.where(c_lb, 4.0 - sy / r_safe, 6.0 + sx / r_safe),
    )
    theta = theta * F32(PI / 4.0)
    out = r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    zero = (sx == 0.0) & (sy == 0.0)
    return jnp.where(zero[..., None], 0.0, out)


def cosine_sample_hemisphere(u):
    """[0,1)^2 -> cosine-weighted direction about +z. (...,2) -> (...,3)."""
    d = concentric_sample_disk(u)
    z = safe_sqrt(1.0 - jnp.sum(d * d, axis=-1))
    return jnp.concatenate([d, z[..., None]], axis=-1)


def sample_triangle(u):
    """[0,1)^2 -> barycentric (u, v) uniform over a triangle (sqrt warp)."""
    s = jnp.sqrt(u[..., 0])
    return jnp.stack([1.0 - s, u[..., 1] * s], axis=-1)


def sample_sphere(u):
    """[0,1)^2 -> uniform direction on the unit sphere. (...,2) -> (...,3)."""
    z = 1.0 - 2.0 * u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = F32(2.0 * PI) * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_sphere_pdf():
    return F32(1.0 / (4.0 * PI))


def power_heuristic(nf, f_pdf, ng, g_pdf):
    """MIS power heuristic (beta = 2). Reference: MonteCarlo.inc.hlsl:75-80."""
    f = nf * f_pdf
    g = ng * g_pdf
    denom = f * f + g * g
    return jnp.where(denom > 0.0, f * f / denom, 0.0)
