"""Procedural test scenes (Cornell box family).

The reference ships demo scenes externally; these presets reproduce the
benchmark configurations from BASELINE.md procedurally. Geometry follows
the reference's conventions: LHS coordinates, front faces wound clockwise
(geometry normal = cross(v0v2, v0v1), HitShader.inc.hlsl:53-55), camera
looking along +z.
"""

import numpy as np

from ..core.constants import (
    MATERIAL_TYPE_CONDUCTOR,
    MATERIAL_TYPE_DIELECTRIC,
    MATERIAL_TYPE_DIFFUSE,
    MATERIAL_TYPE_PLASTIC,
)
from ..camera.camera import look_at_transform
from ..core.types import CameraParams
from .scene import Instance, Material, Mesh, PunctualLight, Scene


def _quad(p0, p1, p2, p3):
    """Two triangles for quad p0-p1-p2-p3 (corners in order). Winding is
    chosen so cross(v0v2, v0v1) faces the intended front."""
    pos = np.asarray([p0, p1, p2, p3], np.float32)
    idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int64)
    return pos, idx


def _merge(parts):
    pos, idx, mat = [], [], []
    off = 0
    for p, i, m in parts:
        pos.append(p)
        idx.append(np.asarray(i) + off)
        mat.append(np.full(len(i), m, np.int64))
        off += len(p)
    return (np.concatenate(pos), np.concatenate(idx), np.concatenate(mat))


def cornell_box(light="area", material_set="diffuse"):
    """Cornell box, side 2 centred at origin (y in [0, 2]), camera on -z.

    light: 'area' (ceiling quad mesh light) or 'point'.
    material_set: 'diffuse' | 'glossy' (Cook-Torrance rough conductor tall
    block + plastic short block) | 'dielectric' (glass tall block).
    """
    white = Material(albedo=(0.73, 0.73, 0.73), name="white")
    red = Material(albedo=(0.63, 0.065, 0.05), name="red")
    green = Material(albedo=(0.14, 0.45, 0.091), name="green")
    mats = [white, red, green]

    # Winding rule: with geometry normal = cross(p2-p0, p1-p0), corners
    # must be ordered counter-clockwise as seen from the front side.
    s = 1.0  # half-width
    h = 2.0  # height
    parts = []
    # floor (+y normal)
    p, i = _quad([-s, 0, -s], [s, 0, -s], [s, 0, s], [-s, 0, s])
    parts.append((p, i, 0))
    # ceiling (-y normal)
    p, i = _quad([-s, h, -s], [-s, h, s], [s, h, s], [s, h, -s])
    parts.append((p, i, 0))
    # back wall at z=+s (normal -z)
    p, i = _quad([-s, 0, s], [s, 0, s], [s, h, s], [-s, h, s])
    parts.append((p, i, 0))
    # left wall x=-s (normal +x) red
    p, i = _quad([-s, 0, -s], [-s, 0, s], [-s, h, s], [-s, h, -s])
    parts.append((p, i, 1))
    # right wall x=+s (normal -x) green
    p, i = _quad([s, 0, -s], [s, h, -s], [s, h, s], [s, 0, s])
    parts.append((p, i, 2))

    def box(cx, cz, w, d, hgt, mat, angle=0.0):
        c, sn = np.cos(angle), np.sin(angle)

        def rot(x, z):
            return (cx + x * c - z * sn, cz + x * sn + z * c)

        corners_b = [rot(-w, -d), rot(w, -d), rot(w, d), rot(-w, d)]
        faces = []
        # top (+y): corners CCW viewed from above
        p, i = _quad(*[[x, hgt, z] for x, z in corners_b])
        faces.append((p, i, mat))
        # four sides, outward normals
        quads = [(corners_b[0], corners_b[1]), (corners_b[1], corners_b[2]),
                 (corners_b[2], corners_b[3]), (corners_b[3], corners_b[0])]
        for (ax, az), (bx, bz) in quads:
            p, i = _quad([ax, 0, az], [bx, 0, bz], [bx, hgt, bz],
                         [ax, hgt, az])
            faces.append((p, i, mat))
        return faces

    if material_set == "diffuse":
        tall_mat = short_mat = 0
    elif material_set == "glossy":
        mats.append(Material(albedo=(3.9, 2.45, 2.14),  # gold-ish k
                             ior=(0.143, 0.375, 1.44),
                             mtype=MATERIAL_TYPE_CONDUCTOR,
                             k=(3.983, 2.386, 1.603),
                             roughness=0.25, multiscattering=True,
                             name="metal"))
        mats.append(Material(albedo=(0.2, 0.3, 0.7), ior=(1.5, 1.5, 1.5),
                             mtype=MATERIAL_TYPE_PLASTIC, roughness=0.15,
                             multiscattering=True, name="plastic"))
        tall_mat, short_mat = 3, 4
    elif material_set == "dielectric":
        mats.append(Material(albedo=(1.0, 1.0, 1.0), ior=(1.5, 1.5, 1.5),
                             mtype=MATERIAL_TYPE_DIELECTRIC, roughness=0.1,
                             multiscattering=True, name="glass"))
        tall_mat, short_mat = 3, 0
    else:
        raise ValueError(material_set)

    parts += box(-0.35, 0.3, 0.26, 0.26, 1.2, tall_mat, angle=0.3)
    parts += box(0.4, -0.25, 0.26, 0.26, 0.6, short_mat, angle=-0.25)

    pos, idx, mat = _merge(parts)
    room = Mesh(positions=pos, indices=idx, material_ids=mat, name="room")

    meshes = [room]
    instances = [Instance(mesh=0, name="room")]
    lights = []

    if light == "area":
        lp, li = _quad([-0.3, h - 1e-3, -0.25], [-0.3, h - 1e-3, 0.25],
                       [0.3, h - 1e-3, 0.25], [0.3, h - 1e-3, -0.25])
        lamp = Mesh(positions=lp, indices=li,
                    material_ids=np.zeros(len(li), np.int64), name="lamp")
        meshes.append(lamp)
        instances.append(Instance(mesh=1, is_emitter=True,
                                  radiance=(17.0, 12.0, 4.0), name="lamp"))
    else:
        lights.append(PunctualLight(kind="point", radiance=(6.0, 6.0, 6.0),
                                    position=(0.0, 1.6, -0.3)))

    scene = Scene(meshes=meshes, instances=instances, materials=mats,
                  lights=lights)
    cam = CameraParams.create(
        transform=look_at_transform((0.0, 1.0, -3.6), (0.0, 1.0, 0.0)),
        fov_x=np.deg2rad(38.0), aperture_radius=0.0, focal_distance=3.6)
    return scene, cam


def uv_sphere(stacks=16, slices=24):
    """Lat-long unit sphere; front faces outward under the LHS
    cross(v0v2, v0v1) convention."""
    verts = []
    for i in range(stacks + 1):
        th = np.pi * i / stacks
        for j in range(slices + 1):
            ph = 2.0 * np.pi * j / slices
            verts.append((np.sin(th) * np.cos(ph), np.cos(th),
                          np.sin(th) * np.sin(ph)))
    verts = np.asarray(verts, np.float32)
    idx = []
    for i in range(stacks):
        for j in range(slices):
            a = i * (slices + 1) + j
            b = a + slices + 1
            if i > 0:
                idx.append([a, b, a + 1])
            if i < stacks - 1:
                idx.append([a + 1, b, b + 1])
    return verts, np.asarray(idx, np.int64)


def sphere_grid(nx=5, nz=5, stacks=24, slices=32, light="area"):
    """Mid-size instancing test scene: nx*nz instanced spheres over a
    ground plane (tens of thousands of world triangles — exercises the
    clustered cull-and-sweep intersector and the two-level BVH)."""
    sv, si = uv_sphere(stacks, slices)
    sphere = Mesh(positions=sv, indices=si,
                  material_ids=np.zeros(len(si), np.int64), name="sphere")

    ext = max(nx, nz) * 1.5
    gp, gi = _quad([-ext, 0, -ext], [ext, 0, -ext], [ext, 0, ext],
                   [-ext, 0, ext])
    ground = Mesh(positions=gp, indices=gi,
                  material_ids=np.zeros(len(gi), np.int64), name="ground")

    mats = [Material(albedo=(0.6, 0.6, 0.6), name="grey"),
            Material(albedo=(3.9, 2.45, 2.14), ior=(0.143, 0.375, 1.44),
                     mtype=MATERIAL_TYPE_CONDUCTOR, k=(3.983, 2.386, 1.603),
                     roughness=0.3, name="metal")]
    meshes = [sphere, ground]
    instances = [Instance(mesh=1, name="ground")]
    rng = np.random.default_rng(11)
    for ix in range(nx):
        for iz in range(nz):
            r = 0.35 + 0.2 * rng.random()
            t = np.zeros((4, 3), np.float32)
            t[0, 0] = t[1, 1] = t[2, 2] = r
            t[3] = ((ix - (nx - 1) / 2) * 1.5, r,
                    (iz - (nz - 1) / 2) * 1.5)
            instances.append(Instance(
                mesh=0, transform=t,
                material_override=1 if (ix + iz) % 2 else 0,
                name=f"sphere_{ix}_{iz}"))

    lp, li = _quad([-2.0, 7.0, -2.0], [-2.0, 7.0, 2.0], [2.0, 7.0, 2.0],
                   [2.0, 7.0, -2.0])
    lamp = Mesh(positions=lp, indices=li,
                material_ids=np.zeros(len(li), np.int64), name="lamp")
    meshes.append(lamp)
    instances.append(Instance(mesh=2, is_emitter=True,
                              radiance=(20.0, 18.0, 15.0), name="lamp"))

    scene = Scene(meshes=meshes, instances=instances, materials=mats)
    cam = CameraParams.create(
        transform=look_at_transform((0.0, 4.5, -1.9 * max(nx, nz)),
                                    (0.0, 0.5, 0.0)),
        fov_x=np.deg2rad(50.0), focal_distance=10.0)
    return scene, cam
