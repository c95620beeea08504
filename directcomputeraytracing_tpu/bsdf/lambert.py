"""Lambert BRDF in tangent space (+z = shading normal).

Reference: Shaders/LambertBRDF.inc.hlsl. Scalar value (albedo applied by
the dispatcher).
"""

import jax.numpy as jnp

from ..core.constants import INV_PI
from ..sampling.montecarlo import cosine_sample_hemisphere


def eval_lambert(wi, wo):
    """(R,) reflectance (without albedo)."""
    return jnp.where((wi[..., 2] > 0.0) & (wo[..., 2] > 0.0), INV_PI, 0.0)


def pdf_lambert(wi, wo):
    return jnp.where((wi[..., 2] > 0.0) & (wo[..., 2] > 0.0),
                     wi[..., 2] * INV_PI, 0.0)


def sample_lambert(wo, u2):
    """Cosine-hemisphere wi. Returns wi (R, 3)."""
    return cosine_sample_hemisphere(u2)
