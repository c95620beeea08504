"""generate_ray_rows must agree with generate_ray (same math, rows
layout)."""

import numpy as np
import jax.numpy as jnp

from directcomputeraytracing_tpu.camera.camera import (
    generate_ray, generate_ray_rows,
)
from directcomputeraytracing_tpu.core.types import CameraParams
from directcomputeraytracing_tpu.camera.camera import look_at_transform


def _cam(aperture=0.0, blades=0):
    return CameraParams(
        transform=jnp.asarray(look_at_transform(
            (1.0, 2.0, -5.0), (0.0, 1.0, 0.0))),
        film_size=jnp.asarray([0.036, 0.024], jnp.float32),
        film_distance=jnp.float32(0.035),
        aperture_radius=jnp.float32(aperture),
        focal_distance=jnp.float32(5.0),
        blade_count=jnp.int32(blades),
        blade_vertex_pos=jnp.asarray([1.0, 0.0], jnp.float32),
        aperture_base_angle=jnp.float32(0.3),
    )


def test_rows_matches_pinhole_and_lens():
    rng = np.random.default_rng(0)
    fs = rng.random((4096, 2), dtype=np.float32)
    ap = rng.random((4096, 3), dtype=np.float32)
    for cam in (_cam(), _cam(aperture=0.02, blades=0),
                _cam(aperture=0.02, blades=5)):
        o, d = generate_ray(cam, jnp.asarray(fs), jnp.asarray(ap))
        orows, drows = generate_ray_rows(
            cam, jnp.asarray(fs[:, 0]), jnp.asarray(fs[:, 1]),
            jnp.asarray(ap[:, 0]), jnp.asarray(ap[:, 1]),
            jnp.asarray(ap[:, 2]))
        np.testing.assert_allclose(np.asarray(orows), np.asarray(o).T,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(drows), np.asarray(d).T,
                                   rtol=1e-5, atol=1e-6)
