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


def generate_ray_rows(cam: CameraParams, film_x, film_y, ap_u, ap_v,
                      ap_w):
    """Component-rows variant of generate_ray: (R,) sample components
    in, ((3, R) origin rows, (3, R) direction rows) out.

    Same math as generate_ray computed per component, so no (R, 3)
    column array is ever materialized: on TPU a narrow-minor-dim
    (R, 3) table tiles at 3/128 lane utilization and each
    materialization (jit boundary, unfused transpose) costs ~4 ms per
    million rays — the work-list traversal consumes rays as (9, R)
    rows (accel/worklist.py), which this generator feeds directly."""
    fx = (-film_x + 0.5) * cam.film_size[0]
    fy = (film_y - 0.5) * cam.film_size[1]
    fz = jnp.broadcast_to(-cam.film_distance, film_x.shape).astype(F32)
    inv_n = 1.0 / jnp.sqrt(fx * fx + fy * fy + fz * fz)
    pdx, pdy, pdz = -fx * inv_n, -fy * inv_n, -fz * inv_n

    blade_count = cam.blade_count.astype(F32)
    blade_angle = F32(PI_MUL_2) / jnp.maximum(blade_count, 1.0)
    ap_r = jnp.broadcast_to(cam.aperture_radius, film_x.shape)
    # concentric disk (<=2 blades) — 8-sector formulation
    sx, sy = 2.0 * ap_u - 1.0, 2.0 * ap_v - 1.0
    c_right, c_rt, c_lb = sx >= -sy, sx > sy, sx <= sy
    r = jnp.where(c_right, jnp.where(c_rt, sx, sy),
                  jnp.where(c_lb, -sx, -sy))
    r_safe = jnp.where(r == 0.0, 1.0, r)
    theta = jnp.where(
        c_right,
        jnp.where(c_rt,
                  jnp.where(sy > 0.0, sy / r_safe, 8.0 + sy / r_safe),
                  2.0 - sx / r_safe),
        jnp.where(c_lb, 4.0 - sy / r_safe, 6.0 + sx / r_safe))
    theta = theta * F32(jnp.pi / 4.0)
    zero = (sx == 0.0) & (sy == 0.0)
    dx = jnp.where(zero, 0.0, r * jnp.cos(theta)) * ap_r
    dy = jnp.where(zero, 0.0, r * jnp.sin(theta)) * ap_r
    # polygonal blade sample (sqrt-warp triangle, rotated to a blade)
    st = jnp.sqrt(ap_u)
    tu, tv = 1.0 - st, ap_v * st
    px = cam.blade_vertex_pos[0] * (tu + tv)
    py = cam.blade_vertex_pos[1] * (tu - tv)
    n = jnp.floor(ap_w * blade_count)
    th2 = n * blade_angle + cam.aperture_base_angle
    c2, s2 = jnp.cos(th2), jnp.sin(th2)
    gx = jnp.where(blade_count <= 2, dx, (px * c2 - py * s2) * ap_r)
    gy = jnp.where(blade_count <= 2, dy, (py * c2 + px * s2) * ap_r)

    foc = cam.focal_distance / pdz
    ldx, ldy, ldz = pdx * foc - gx, pdy * foc - gy, pdz * foc
    inv_l = 1.0 / jnp.sqrt(ldx * ldx + ldy * ldy + ldz * ldz)

    use_lens = cam.aperture_radius > 0.0
    ox = jnp.where(use_lens, gx, 0.0)
    oy = jnp.where(use_lens, gy, 0.0)
    oz = jnp.zeros_like(ox)
    wx = jnp.where(use_lens, ldx * inv_l, pdx)
    wy = jnp.where(use_lens, ldy * inv_l, pdy)
    wz = jnp.where(use_lens, ldz * inv_l, pdz)

    m = cam.transform
    o_rows = jnp.stack(
        [ox * m[0, 0] + oy * m[1, 0] + oz * m[2, 0] + m[3, 0],
         ox * m[0, 1] + oy * m[1, 1] + oz * m[2, 1] + m[3, 1],
         ox * m[0, 2] + oy * m[1, 2] + oz * m[2, 2] + m[3, 2]], axis=0)
    d_rows = jnp.stack(
        [wx * m[0, 0] + wy * m[1, 0] + wz * m[2, 0],
         wx * m[0, 1] + wy * m[1, 1] + wz * m[2, 1],
         wx * m[0, 2] + wy * m[1, 2] + wz * m[2, 2]], axis=0)
    return o_rows, d_rows


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
