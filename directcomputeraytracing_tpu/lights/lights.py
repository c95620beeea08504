"""Light sampling and evaluation (point / directional / mesh / environment).

Vectorized port of reference: Shaders/Light.inc.hlsl and
RayTracingCommon.inc.hlsl:124-225 (SampleLightDirect / EvaluateLightDirect)
with per-type branches turned into masked selects over the ray batch.

Deviations from the reference, both deliberate:
  * triangle-light sample pdf uses 1/area (the reference's Sample path
    uses 2/area while its Evaluate path uses 1/area — Light.inc.hlsl:53 vs
    :33 — an internal inconsistency; we use the physically correct value
    on both paths so MIS weights are consistent).
  * environment radiance uses an equirectangular lat-long map rather than
    a cubemap (identical capability, simpler addressing on TPU); sampling
    is uniform-sphere like the reference.
  * every light-sample call consumes a fixed budget of 4 scalar samples
    (selection + triangle-pick + 2D) regardless of the selected light's
    type, so megakernel and wavefront integrators consume RNG streams
    identically (the reference consumes a type-dependent count).
"""

from typing import NamedTuple

import jax.numpy as jnp

from ..core.constants import (
    LIGHT_FLAGS_DIRECTIONAL,
    LIGHT_FLAGS_ENVIRONMENT,
    LIGHT_FLAGS_MESH,
    LIGHT_FLAGS_POINT,
    PI,
    SHADOW_EPSILON,
)
from ..core.types import transform_point, transform_vector
from ..sampling.montecarlo import sample_sphere, sample_triangle, uniform_sphere_pdf

F32 = jnp.float32
I32 = jnp.int32


class LightSample(NamedTuple):
    radiance: jnp.ndarray   # (R, 3)
    wi: jnp.ndarray         # (R, 3)
    pdf: jnp.ndarray        # (R,)
    distance: jnp.ndarray   # (R,)
    is_delta: jnp.ndarray   # (R,) bool


def _normalize_len(v):
    l = jnp.linalg.norm(v, axis=-1)
    return v / jnp.maximum(l, 1e-20)[..., None], l


def _cubemap_face_uv(wi):
    """D3D cubemap addressing: direction -> (face, u, v) with faces
    ordered +X -X +Y -Y +Z -Z and u,v in [0,1] (reference: the
    TextureCube hardware sample in Shaders/Light.inc.hlsl:77-81 /
    Source/GPUTexture.cpp:165-245). Same face selection and
    tie-breaking as `utils.hdr.cubemap_to_latlong`."""
    x, y, z = wi[..., 0], wi[..., 1], wi[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = jnp.where(
        is_x, jnp.where(x > 0, 0, 1),
        jnp.where(is_y, jnp.where(y > 0, 2, 3),
                  jnp.where(z > 0, 4, 5))).astype(I32)
    ma = jnp.maximum(jnp.where(is_x, ax, jnp.where(is_y, ay, az)), 1e-20)
    sc = jnp.where(is_x, jnp.where(x > 0, -z, z),
                   jnp.where(is_y, x, jnp.where(z > 0, x, -x)))
    tc = jnp.where(is_y, jnp.where(y > 0, z, -z), -y)
    return face, sc / ma * 0.5 + 0.5, tc / ma * 0.5 + 0.5


def _sample_cubemap(faces_tex, wi):
    """Bilinear cube lookup on (6, S, S, 3) faces. Texels are clamped
    to their own face (D3D12's seamless cube filtering blends across
    the edge instead — a <=half-texel delta confined to face seams,
    documented in docs/PARITY.md)."""
    s = faces_tex.shape[1]
    face, u, v = _cubemap_face_uv(wi)
    fx = u * s - 0.5
    fy = v * s - 0.5
    x0 = jnp.clip(jnp.floor(fx).astype(I32), 0, s - 1)
    y0 = jnp.clip(jnp.floor(fy).astype(I32), 0, s - 1)
    x1 = jnp.minimum(x0 + 1, s - 1)
    y1 = jnp.minimum(y0 + 1, s - 1)
    tx = jnp.clip(fx - x0.astype(F32), 0.0, 1.0)[..., None]
    ty = jnp.clip(fy - y0.astype(F32), 0.0, 1.0)[..., None]
    v00 = faces_tex[face, y0, x0]
    v01 = faces_tex[face, y0, x1]
    v10 = faces_tex[face, y1, x0]
    v11 = faces_tex[face, y1, x1]
    return (v00 * (1 - tx) + v01 * tx) * (1 - ty) \
        + (v10 * (1 - tx) + v11 * tx) * ty


def sample_env_radiance(env_texture, wi, has_env_texture):
    """Environment radiance lookup; unit radiance scale.

    (6, S, S, 3) textures are sampled directly as a D3D-order cubemap
    (the reference's native path); (H, W, 3) as an equirectangular
    lat-long panorama (bilinear). The rank is static under jit, so the
    branch costs nothing."""
    if not has_env_texture:
        return jnp.ones(wi.shape[:-1] + (3,), F32)
    if env_texture.ndim == 4:
        return _sample_cubemap(env_texture, wi)
    h, w = env_texture.shape[0], env_texture.shape[1]
    u = jnp.arctan2(wi[..., 2], wi[..., 0]) * F32(0.5 / PI) + 0.5
    v = jnp.arccos(jnp.clip(wi[..., 1], -1.0, 1.0)) * F32(1.0 / PI)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x).astype(I32)
    y0 = jnp.floor(y).astype(I32)
    fx = x - x0
    fy = y - y0
    x0w = jnp.mod(x0, w)
    x1w = jnp.mod(x0 + 1, w)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y0 + 1, 0, h - 1)
    v00 = env_texture[y0c, x0w]
    v01 = env_texture[y0c, x1w]
    v10 = env_texture[y1c, x0w]
    v11 = env_texture[y1c, x1w]
    fx = fx[..., None]
    fy = fy[..., None]
    return (v00 * (1 - fx) + v01 * fx) * (1 - fy) \
        + (v10 * (1 - fx) + v11 * fx) * fy


def _mesh_light_triangle(scene, light_idx, u_tri):
    """Pick a uniform triangle of the light's range; returns world verts,
    triangle count, instance transform."""
    offset = scene.light_tri_offset[light_idx].astype(I32)
    count = scene.light_tri_count[light_idx].astype(I32)
    pick = jnp.minimum((u_tri * count.astype(F32)).astype(I32), count - 1)
    tri_idx = jnp.clip(offset + pick, 0, scene.triangles.shape[0] - 1)
    tri = scene.triangles[tri_idx].astype(I32)
    inst = scene.light_instance[light_idx].astype(I32)
    m = scene.instance_transforms[inst]
    v0 = transform_point(scene.vtx_position[tri[..., 0]], m)
    v1 = transform_point(scene.vtx_position[tri[..., 1]], m)
    v2 = transform_point(scene.vtx_position[tri[..., 2]], m)
    return v0, v1, v2, count


def sample_light_direct(scene, light_count, has_env_texture, p,
                        u_sel, u_tri, u2):
    """NEE light sample at shading points p (R, 3). light_count static."""
    R = p.shape[0]
    idx = jnp.minimum((u_sel * light_count).astype(I32), light_count - 1)
    flags = scene.light_flags[idx]
    radiance0 = scene.light_radiance[idx]
    lpos = scene.light_position[idx]

    is_point = (flags & LIGHT_FLAGS_POINT) != 0
    is_dir = (flags & LIGHT_FLAGS_DIRECTIONAL) != 0
    is_mesh = (flags & LIGHT_FLAGS_MESH) != 0
    is_env = (flags & LIGHT_FLAGS_ENVIRONMENT) != 0

    # point light (reference Light.inc.hlsl:4-12)
    to_l = lpos - p
    dist_p = jnp.linalg.norm(to_l, axis=-1)
    wi_p = to_l / jnp.maximum(dist_p, 1e-20)[..., None]
    rad_p = radiance0 / jnp.maximum(dist_p * dist_p, 1e-20)[..., None]

    # directional (:14-20): position stores the direction the light travels
    wi_d = -lpos

    # mesh light (:41-72 + pdf/lightTriangleCount)
    v0, v1, v2, tri_count = _mesh_light_triangle(scene, idx, u_tri)
    area = 0.5 * jnp.linalg.norm(jnp.cross(v2 - v0, v1 - v0), axis=-1)
    bary = sample_triangle(u2)
    spos = v0 + (v1 - v0) * bary[..., 0:1] + (v2 - v0) * bary[..., 1:2]
    nrm, _ = _normalize_len(jnp.cross(v2 - v0, v1 - v0))
    wi_m, dist_m = _normalize_len(spos - p)
    wi_dot_n = -jnp.sum(wi_m * nrm, axis=-1)
    pdf_area = jnp.where(area >= 5e-7, 1.0 / jnp.maximum(area, 5e-7), 0.0)
    pdf_m = pdf_area * dist_m * dist_m / jnp.maximum(wi_dot_n, 1e-20)
    pdf_m = jnp.where(wi_dot_n > 0.0, pdf_m, 0.0) \
        / tri_count.astype(F32)
    rad_m = jnp.where((wi_dot_n > 0.0)[..., None], radiance0, 0.0)

    # environment (:94-104): uniform sphere
    wi_e = sample_sphere(u2)
    rad_e = radiance0 * sample_env_radiance(
        scene.env_texture, wi_e, has_env_texture)

    wi = jnp.where(is_point[..., None], wi_p,
                   jnp.where(is_dir[..., None], wi_d,
                             jnp.where(is_mesh[..., None], wi_m, wi_e)))
    radiance = jnp.where(is_point[..., None], rad_p,
                         jnp.where(is_dir[..., None], radiance0,
                                   jnp.where(is_mesh[..., None], rad_m,
                                             rad_e)))
    pdf = jnp.where(is_point | is_dir, 1.0,
                    jnp.where(is_mesh, pdf_m, uniform_sphere_pdf()))
    distance = jnp.where(is_point, dist_p,
                         jnp.where(is_mesh, dist_m, jnp.inf))

    pdf = pdf / F32(light_count)
    distance = jnp.where(jnp.isfinite(distance),
                         distance * F32(1.0 - SHADOW_EPSILON), distance)
    return LightSample(radiance=radiance, wi=wi, pdf=pdf,
                       distance=distance, is_delta=is_point | is_dir)


def evaluate_light_direct(scene, light_count, has_env_texture, light_idx,
                          triangle_idx, normal, wi, distance):
    """Radiance & pdf of hitting light `light_idx` via BSDF direction wi
    at `distance` with surface normal `normal` (mesh lights) — used for
    the MIS implicit-hit term. Invalid indices yield pdf 0."""
    valid = light_idx != jnp.uint32(0xFFFFFFFF)
    idx = jnp.where(valid, light_idx, 0).astype(I32)
    idx = jnp.clip(idx, 0, scene.light_flags.shape[0] - 1)
    flags = scene.light_flags[idx]
    radiance0 = scene.light_radiance[idx]
    is_mesh = (flags & LIGHT_FLAGS_MESH) != 0
    is_env = (flags & LIGHT_FLAGS_ENVIRONMENT) != 0

    # mesh light solid-angle pdf from the actual hit triangle
    tri = scene.triangles[
        jnp.clip(triangle_idx, 0, scene.triangles.shape[0] - 1)].astype(I32)
    inst = scene.light_instance[idx].astype(I32)
    m = scene.instance_transforms[inst]
    v0 = transform_point(scene.vtx_position[tri[..., 0]], m)
    v1 = transform_point(scene.vtx_position[tri[..., 1]], m)
    v2 = transform_point(scene.vtx_position[tri[..., 2]], m)
    cross = jnp.cross(v2 - v0, v1 - v0)
    area2 = jnp.linalg.norm(cross, axis=-1)  # 2 * area
    pdf_area = jnp.where(area2 >= 1e-6, 1.0 / jnp.maximum(0.5 * area2,
                                                          1e-20), 0.0)
    wi_dot_n = -jnp.sum(wi * normal, axis=-1)
    pdf_m = pdf_area * jnp.where(
        wi_dot_n > 0.0,
        distance * distance / jnp.maximum(wi_dot_n, 1e-20), 0.0)
    pdf_m = pdf_m / scene.light_tri_count[idx].astype(F32)
    rad_m = jnp.where((wi_dot_n > 0.0)[..., None], radiance0, 0.0)

    rad_e = radiance0 * sample_env_radiance(
        scene.env_texture, wi, has_env_texture)

    radiance = jnp.where(is_mesh[..., None], rad_m,
                         jnp.where(is_env[..., None], rad_e, 0.0))
    pdf = jnp.where(is_mesh, pdf_m,
                    jnp.where(is_env, uniform_sphere_pdf(), 0.0))
    pdf = pdf / F32(light_count)
    radiance = jnp.where(valid[..., None], radiance, 0.0)
    pdf = jnp.where(valid, pdf, 0.0)
    return radiance, pdf


def evaluate_env(scene, wi, env_light_index, has_env_texture):
    """Direct env-map radiance for primary-miss rays (LIGHT_VISIBLE)."""
    rad = scene.light_radiance[env_light_index]
    return rad * sample_env_radiance(scene.env_texture, wi, has_env_texture)
