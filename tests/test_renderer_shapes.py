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


def test_frame_index_seed_mode_survives_reset():
    """SEED_FRAME_INDEX keeps advancing the seed across film resets
    (reference EFrameSeedType::FrameIndex vs SampleCount,
    DirectComputeRayTracing.h:111, LaunchRendererLoop.cpp:256-262):
    after reset(), FrameIndex renders DIFFERENT samples while
    SampleCount reproduces the same image."""
    import numpy as np

    from directcomputeraytracing_tpu.integrator.renderer import Renderer
    from directcomputeraytracing_tpu.scene.presets import cornell_box

    scene, cam = cornell_box(light="point")
    r = Renderer(scene, cam, width=24, height=16, max_bounce=1,
                 integrator="megakernel")
    a = np.asarray(r.render(spp=1, seed_mode="frame_index"))
    r.reset()
    b = np.asarray(r.render(spp=1, seed_mode="frame_index"))
    assert not np.allclose(a, b), "frame_index must not restart"
    r2 = Renderer(scene, cam, width=24, height=16, max_bounce=1,
                  integrator="megakernel")
    c = np.asarray(r2.render(spp=1))
    r2.reset()
    d = np.asarray(r2.render(spp=1))
    np.testing.assert_allclose(c, d)   # sample_count DOES restart
