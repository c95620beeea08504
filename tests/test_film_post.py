"""Film reconstruction filter + post-processing pipeline tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from directcomputeraytracing_tpu.film.filters import (
    FilterParams, convolve_sample_pass, filter_weight,
)
from directcomputeraytracing_tpu.post.pipeline import (
    PostParams, average_log_luminance, ev100_from_camera,
    ev100_to_exposure, linear_to_srgb, post_process, reinhard, resolve_film,
)


def _constant_frame(h=8, w=8, jitter=0.5, value=(1.0, 2.0, 3.0)):
    pos = np.full((h, w, 2), jitter, np.float32)
    val = np.tile(np.asarray(value, np.float32), (h, w, 1))
    return jnp.asarray(pos), jnp.asarray(val)


@pytest.mark.parametrize("kind,radius", [
    ("box", 0.5), ("box", 1.0), ("triangle", 2.0), ("gaussian", 2.0),
    ("mitchell", 2.0), ("lanczos", 4.0),
])
def test_constant_input_reconstructs_constant(kind, radius):
    # any normalized filter must reproduce a constant image exactly after
    # the weighted resolve
    pos, val = _constant_frame(16, 16)
    p = FilterParams(kind=kind, radius=radius)
    vsum, wsum = convolve_sample_pass(pos, val, p)
    interior = (slice(6, 10), slice(6, 10))
    out = np.asarray(vsum)[interior] / np.asarray(wsum)[interior][..., None]
    np.testing.assert_allclose(out, np.asarray(val)[interior], rtol=1e-5)


def test_box_half_radius_is_identity():
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.random((8, 8, 2), np.float32))
    val = jnp.asarray(rng.random((8, 8, 3), np.float32))
    vsum, wsum = convolve_sample_pass(pos, val,
                                      FilterParams(kind="box", radius=0.5))
    # every sample falls in its own pixel with weight 1 -- except samples
    # whose jitter puts them more than 0.5 from the center, which box r=0.5
    # still accepts since |offset| = |0.5 - jitter| <= 0.5 always
    np.testing.assert_allclose(np.asarray(wsum), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vsum), np.asarray(val), rtol=1e-6)


def test_filter_weights_match_reference_formulas():
    p = FilterParams(kind="mitchell", radius=2.0)
    # Mitchell B=C=1/3 at x=0: (6-2B)/6 = 16/18
    w0 = float(filter_weight(p, jnp.float32(0.0), jnp.float32(0.0)))
    np.testing.assert_allclose(w0, (16.0 / 18.0) ** 2, rtol=1e-5)
    g = FilterParams(kind="gaussian", radius=2.0, gaussian_alpha=1.5)
    w = float(filter_weight(g, jnp.float32(2.0), jnp.float32(0.0)))
    np.testing.assert_allclose(w, 0.0, atol=1e-7)  # zero at the radius


def test_resolve_film_zero_weight_is_zero():
    v = jnp.ones((4, 4, 3))
    w = jnp.zeros((4, 4))
    assert float(np.abs(np.asarray(resolve_film(v, w))).max()) == 0.0


def test_ev100_formulas():
    # f/8, 1s, ISO100 -> EV100 = log2(64) = 6
    np.testing.assert_allclose(float(ev100_from_camera(8.0, 1.0, 100.0)),
                               6.0, rtol=1e-6)
    np.testing.assert_allclose(float(ev100_to_exposure(jnp.float32(0.0))),
                               1.0 / 1.2, rtol=1e-6)


def test_reinhard_white_point():
    # at color == white^2 ... the extended operator maps L=white to 1
    white_sqr = 4.0
    c = jnp.float32(2.0)
    np.testing.assert_allclose(float(reinhard(c, white_sqr)), 1.0, rtol=1e-6)


def test_post_process_shapes_and_range():
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.random((8, 8, 3), np.float32) * 10)
    w = jnp.ones((8, 8))
    out = np.asarray(post_process(v, w, PostParams(auto_exposure=True)))
    assert out.shape == (8, 8, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_srgb_roundtrip_monotonic():
    x = jnp.linspace(0, 1, 64)
    y = np.asarray(linear_to_srgb(x))
    assert np.all(np.diff(y) >= 0)
