"""Renderer shape-robustness: odd resolutions, tile-order inversion,
fused-dispatch equivalence, zero-spp resolve."""

import numpy as np
import jax.numpy as jnp

from directcomputeraytracing_tpu.integrator.common import RenderConfig
from directcomputeraytracing_tpu.integrator.megakernel import (
    full_frame_pixels, tiled_frame_pixels,
)
from directcomputeraytracing_tpu.integrator.renderer import Renderer
from directcomputeraytracing_tpu.scene.presets import cornell_box


def test_tiled_order_is_a_permutation_odd_sizes():
    for w, h in [(37, 23), (128, 8), (5, 5), (130, 17)]:
        cfg = RenderConfig(width=w, height=h)
        px, py, inv = tiled_frame_pixels(cfg)
        rx, ry = full_frame_pixels(cfg)
        # applying inv restores raster order
        np.testing.assert_array_equal(np.asarray(px)[np.asarray(inv)],
                                      np.asarray(rx))
        np.testing.assert_array_equal(np.asarray(py)[np.asarray(inv)],
                                      np.asarray(ry))
        assert sorted(np.asarray(px) + np.asarray(py) * w) == \
            list(range(w * h))


def test_odd_resolution_render_and_zero_spp():
    scene, cam = cornell_box(light="point")
    r = Renderer(scene, cam, width=37, height=23, max_bounce=1)
    img0 = r.image()
    assert img0.shape == (23, 37, 3)
    assert np.abs(img0).max() == 0.0          # zero spp -> zeros, not NaN
    img = r.render(spp=2)
    assert img.shape == (23, 37, 3)
    assert np.isfinite(img).all() and img.max() > 0
