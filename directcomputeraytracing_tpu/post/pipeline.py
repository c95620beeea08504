"""Post-processing: luminance reduction, physically-based exposure,
Reinhard tone map, sRGB encode.

TPU re-design of the reference's three post passes:
  * SceneLuminance (Source/SceneLuminance.cpp + Shaders/SumLuminance.hlsl)
    — log-luminance tree reduction of the resolved film. On TPU the whole
    8x8-block + ping-pong reduction collapses into one `jnp.sum` (XLA
    emits the optimal tree).
  * PostProcessing (Source/PostProcessing.cpp + Shaders/PostProcessings.hlsl)
    — film resolve, EV100 exposure (manual, from camera N/t/ISO, or auto
    from average log-luminance), Reinhard with white point.
  * The sRGB conversion the reference gets from its _SRGB render target.
"""

from typing import NamedTuple

import jax.numpy as jnp

F32 = jnp.float32

# Rec. 601 luma + black bias (reference: SumLuminance.hlsl:23-33)
LUM_VECTOR = (0.299, 0.587, 0.114)
BLACK_BIAS = 1e-4
FILM_CLAMP = 65000.0


class PostParams(NamedTuple):
    enabled: bool = True
    auto_exposure: bool = True
    manual_ev100: float = 15.0          # Scene.h:182
    relative_aperture: float = 8.0      # f-number, Scene.cpp:636
    shutter_time: float = 1.0
    iso: float = 100.0
    ev100_from_camera: bool = True      # Scene.h:185
    luminance_white: float = 1.0


def resolve_film(value, weight):
    """(H, W, 3), (H, W) -> clamped radiance (reference:
    SumLuminance.hlsl ResolveFilmColor — w>0 ? rgb/w : 0, clamp 65000)."""
    safe = jnp.maximum(weight[..., None], 1e-20)
    out = jnp.where(weight[..., None] > 0.0, value / safe, 0.0)
    return jnp.clip(out, 0.0, FILM_CLAMP)


def average_log_luminance(color):
    """Mean log(lum + bias) over the frame (the reference's two-stage GPU
    reduction collapsed to one XLA reduce)."""
    lum = (color[..., 0] * LUM_VECTOR[0] + color[..., 1] * LUM_VECTOR[1]
           + color[..., 2] * LUM_VECTOR[2])
    return jnp.mean(jnp.log(BLACK_BIAS + lum))


def ev100_from_camera(relative_aperture, shutter_time, iso):
    """EV100 = log2(N^2/t * 100/S) (reference: PostProcessing.cpp:39-42)."""
    return jnp.log2(relative_aperture * relative_aperture / shutter_time
                    * 100.0 / iso)


def ev100_from_average_luminance(avg_lum):
    """(reference: PostProcessings.hlsl:21-24)."""
    return jnp.log2(avg_lum * 100.0 / 12.5)


def ev100_to_exposure(ev100):
    """exposure = 1 / (1.2 * 2^EV100) (reference: PostProcessings.hlsl:26-30)."""
    return 1.0 / (1.2 * jnp.exp2(ev100))


def reinhard(color, max_white_sqr):
    """Extended Reinhard with white point (reference:
    PostProcessings.hlsl:33-36)."""
    return color * (1.0 + color / max_white_sqr) / (1.0 + color)


def linear_to_srgb(c):
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, c * 12.92,
                     1.055 * jnp.power(jnp.maximum(c, 1e-10), 1.0 / 2.4)
                     - 0.055)


def post_process(film_value, film_weight, params: PostParams,
                 aperture_is_pinhole=False):
    """Full post chain: resolve -> exposure -> Reinhard -> sRGB.
    Returns (H, W, 3) display-ready values in [0, 1]."""
    color = resolve_film(film_value, film_weight)
    if not params.enabled:
        return linear_to_srgb(color)
    if params.auto_exposure:
        avg_lum = jnp.exp(average_log_luminance(color))
        ev100 = ev100_from_average_luminance(avg_lum)
    elif params.ev100_from_camera and not aperture_is_pinhole:
        ev100 = ev100_from_camera(params.relative_aperture,
                                  params.shutter_time, params.iso)
    else:
        ev100 = jnp.asarray(params.manual_ev100, F32)
    color = color * ev100_to_exposure(ev100)
    color = reinhard(color, params.luminance_white * params.luminance_white)
    return linear_to_srgb(color)
