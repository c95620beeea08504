"""PBRT-style splatting film reconstruction filters.

TPU re-design of the reference's sample-convolution pass
(reference: Shaders/SampleConvolution.hlsl — per output pixel, gather
every neighbor pixel's (sample position, sample value) within the filter
radius, accumulate sum(w*v) into film.rgb and sum(w) into film.a;
CPU-side filter constants in Source/SampleConvolution.cpp:105-131;
defaults radius=1 box, gaussian alpha=1.5, Mitchell B=C=1/3, lanczos
tau=3 — Source/Scene.h:131-136).

Instead of a per-pixel gather loop, the whole frame convolves as a sum of
statically-unrolled shifted-array terms: for each (dy, dx) in the filter
footprint the sample plane is shifted by padding+slicing and weighted by
the vectorized filter kernel — everything stays dense (H, W) math on the
VPU with no gathers.
"""

import math
from typing import NamedTuple

import jax.numpy as jnp

F32 = jnp.float32
PI = 3.1415926535


class FilterParams(NamedTuple):
    """Static (hashable) filter configuration."""
    kind: str = "box"          # box | triangle | gaussian | mitchell | lanczos
    radius: float = 1.0
    gaussian_alpha: float = 1.5
    mitchell_b: float = 1.0 / 3.0
    mitchell_c: float = 1.0 / 3.0
    lanczos_tau: int = 3


def _gaussian_1d(d, alpha, radius):
    return jnp.maximum(0.0, jnp.exp(-alpha * d * d)
                       - math.exp(-alpha * radius * radius))


def _mitchell_1d(x, b, c):
    x = jnp.abs(2.0 * x)
    f0 = -b - 6 * c
    f1 = 6 * b + 30 * c
    f2 = -12 * b - 48 * c
    f3 = 8 * b + 24 * c
    f4 = 12 - 9 * b - 6 * c
    f5 = -18 + 12 * b + 6 * c
    f6 = 6 - 2 * b
    near = f4 * x * x * x + f5 * x * x + f6
    far = f0 * x * x * x + f1 * x * x + f2 * x + f3
    return jnp.where(x < 1.0, near,
                     jnp.where(x < 2.0, far, 0.0)) * (1.0 / 6.0)


def _sinc(x):
    x = jnp.abs(x)
    return jnp.where(x >= 1e-5, jnp.sin(PI * x) / jnp.maximum(PI * x, 1e-20),
                     1.0)


def _windowed_sinc(x, radius, tau):
    x = jnp.abs(x)
    return jnp.where(x > radius, 0.0, _sinc(x) * _sinc(x / tau))


def filter_weight(p: FilterParams, dx, dy):
    """Vectorized 2D filter weight at offset (dx, dy) from the pixel center
    (reference: EvaluateFilter, SampleConvolution.hlsl:52-65)."""
    r = p.radius
    if p.kind == "box":
        return jnp.where((jnp.abs(dx) <= r) & (jnp.abs(dy) <= r), 1.0, 0.0)
    if p.kind == "triangle":
        return (jnp.maximum(0.0, r - jnp.abs(dx))
                * jnp.maximum(0.0, r - jnp.abs(dy)))
    if p.kind == "gaussian":
        return (_gaussian_1d(dx, p.gaussian_alpha, r)
                * _gaussian_1d(dy, p.gaussian_alpha, r))
    if p.kind == "mitchell":
        return _mitchell_1d(dx / r, p.mitchell_b, p.mitchell_c) \
            * _mitchell_1d(dy / r, p.mitchell_b, p.mitchell_c)
    if p.kind == "lanczos":
        return _windowed_sinc(dx, r, p.lanczos_tau) \
            * _windowed_sinc(dy, r, p.lanczos_tau)
    raise ValueError(p.kind)


def convolve_sample_pass(sample_pos, sample_value, p: FilterParams):
    """One sample per pixel -> (weighted value sum (H, W, 3), weight sum
    (H, W)) under filter p.

    sample_pos: (H, W, 2) in-pixel jitter in [0,1); sample_value (H, W, 3).
    Matches the reference gather loop bounds: output pixel center c=q+0.5
    collects source pixels x in [floor(c - r), floor(c + r)] clamped to the
    frame.
    """
    h, w = sample_value.shape[:2]
    lo = math.floor(0.5 - p.radius)
    hi = math.floor(0.5 + p.radius)
    offs = range(lo, hi + 1)
    pad = max(-lo, hi)

    def shifted(arr, dy, dx):
        padded = jnp.pad(arr, [(pad, pad), (pad, pad)]
                         + [(0, 0)] * (arr.ndim - 2))
        return padded[pad + dy: pad + dy + h, pad + dx: pad + dx + w]

    valid_row = jnp.arange(h)[:, None]
    valid_col = jnp.arange(w)[None, :]

    vsum = jnp.zeros((h, w, 3), F32)
    wsum = jnp.zeros((h, w), F32)
    for dy in offs:
        for dx in offs:
            jit = shifted(sample_pos, dy, dx)
            val = shifted(sample_value, dy, dx)
            valid = ((valid_row + dy >= 0) & (valid_row + dy < h)
                     & (valid_col + dx >= 0) & (valid_col + dx < w))
            # offset = pixel center - absolute sample position
            ox = 0.5 - dx - jit[..., 0]
            oy = 0.5 - dy - jit[..., 1]
            wgt = filter_weight(p, ox, oy) * valid
            vsum = vsum + wgt[..., None] * val
            wsum = wsum + wgt
    return vsum, wsum
