"""Batched camera ray generation: pinhole / thin-lens with polygonal bokeh.

Vectorized port of the reference's GenerateRay / SampleAperture
(reference: Shaders/RayTracingCommon.inc.hlsl:38-86): the film plane sits
at -film_distance in camera space, rays pass through a polygonal (or
concentric-disk) aperture sample and are refocused through the focal
plane; camera space is LHS with the view direction along +z and the film
x axis mirrored.
"""

import jax.numpy as jnp

from ..core.constants import PI_MUL_2
from ..core.types import CameraParams, transform_point44, transform_vector44
from ..sampling.montecarlo import concentric_sample_disk, sample_triangle

F32 = jnp.float32


def _normalize(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def sample_aperture(u3, aperture_radius, blade_count, blade_vertex_pos,
                    blade_angle, base_angle):
    """2D aperture point: concentric disk for <=2 blades, else a uniformly
    sampled triangle of the unit polygon rotated to a random blade."""
    disk = concentric_sample_disk(u3[..., :2]) * aperture_radius[..., None]

    uv = sample_triangle(u3[..., :2])
    px = blade_vertex_pos[0] * (uv[..., 0] + uv[..., 1])
    py = blade_vertex_pos[1] * (uv[..., 0] - uv[..., 1])
    n = jnp.floor(u3[..., 2] * blade_count)
    theta = n * blade_angle + base_angle
    c, s = jnp.cos(theta), jnp.sin(theta)
    poly = jnp.stack([px * c - py * s, py * c + px * s], axis=-1) \
        * aperture_radius[..., None]

    return jnp.where(blade_count <= 2, disk, poly)


def generate_ray(cam: CameraParams, film_sample, aperture_sample):
    """film_sample (R, 2) in [0,1)^2, aperture_sample (R, 3).

    Returns (origin (R, 3), direction (R, 3)) in world space.
    """
    film_pos = jnp.stack(
        [
            (-film_sample[..., 0] + 0.5) * cam.film_size[0],
            (film_sample[..., 1] - 0.5) * cam.film_size[1],
            jnp.broadcast_to(-cam.film_distance, film_sample[..., 0].shape),
        ],
        axis=-1,
    )
    pin_origin = jnp.zeros_like(film_pos)
    pin_dir = _normalize(-film_pos)

    blade_count = cam.blade_count.astype(F32)
    blade_angle = F32(PI_MUL_2) / jnp.maximum(blade_count, 1.0)
    aperture_pos = sample_aperture(
        aperture_sample,
        jnp.broadcast_to(cam.aperture_radius, film_sample[..., 0].shape),
        blade_count, cam.blade_vertex_pos, blade_angle,
        cam.aperture_base_angle)
    aperture_pos3 = jnp.concatenate(
        [aperture_pos, jnp.zeros_like(aperture_pos[..., :1])], axis=-1)
    focus_point = pin_dir * (cam.focal_distance
                             / pin_dir[..., 2:3])
    lens_origin = aperture_pos3
    lens_dir = _normalize(focus_point - lens_origin)

    use_lens = cam.aperture_radius > 0.0
    origin = jnp.where(use_lens, lens_origin, pin_origin)
    direction = jnp.where(use_lens, lens_dir, pin_dir)

    origin = transform_point44(origin, cam.transform)
    direction = transform_vector44(direction, cam.transform)
    return origin, direction


def look_at_transform(eye, target, up=(0.0, 1.0, 0.0)):
    """Row-vector camera->world matrix for a LHS +z-forward camera (numpy)."""
    import numpy as np

    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    up = np.asarray(up, np.float64)
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    true_up = np.cross(fwd, right)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = right
    m[1, :3] = true_up
    m[2, :3] = fwd
    m[3, :3] = eye
    return m
