"""Splatting film: per-pixel sample position/value buffers + accumulation.

The reference renders into per-pixel sample position & value textures and
convolves them with a reconstruction filter into an accumulating RGBA32F
film (value.rgb = sum of w*v, value.a = sum of w) — reference:
Shaders/SampleConvolution.hlsl, Source/SampleConvolution.cpp. Here the
film is a pytree of (H, W, 3) value and (H, W) weight arrays; the filter
gather lives in `film.filters` and the simple box path (radius 0.5: each
sample lands in its own pixel with weight 1) is inlined for speed.
"""

from typing import NamedTuple

import jax.numpy as jnp

F32 = jnp.float32


class Film(NamedTuple):
    value: jnp.ndarray   # (H, W, 3) sum of w * v
    weight: jnp.ndarray  # (H, W) sum of w


def create_film(height, width):
    return Film(value=jnp.zeros((height, width, 3), F32),
                weight=jnp.zeros((height, width), F32))


def accumulate_box(film: Film, sample_value, height, width):
    """Box filter, radius 0.5: sample_value laid out as (H*W, 3) in pixel
    raster order accumulates straight into its own pixel."""
    v = sample_value.reshape(height, width, 3)
    return Film(value=film.value + v, weight=film.weight + 1.0)


def resolve(film: Film):
    """Filtered radiance estimate: value / weight."""
    w = jnp.maximum(film.weight[..., None], 1e-10)
    return film.value / w
