"""OBJ + MTL ingestion tests (reference behavior:
Source/WavefrontOBJLoading.cpp — handedness flip, winding flip, V flip,
dedup, Plastic default material, one mesh+instance per shape)."""

import textwrap

import numpy as np
import pytest

from directcomputeraytracing_tpu.core.constants import MATERIAL_TYPE_PLASTIC
from directcomputeraytracing_tpu.scene.obj_loader import load_obj
from directcomputeraytracing_tpu.scene.scene import flatten_scene


OBJ = textwrap.dedent("""\
    mtllib test.mtl
    o quad
    v 0 0 0
    v 1 0 0
    v 1 1 0
    v 0 1 0
    vn 0 0 1
    vn 0 0 1
    vn 0 0 1
    vn 0 0 1
    vt 0 0
    vt 1 0
    vt 1 1
    vt 0 1
    usemtl red
    f 1/1/1 2/2/2 3/3/3 4/4/4
    o tri
    usemtl blue
    f -4/-4/-4 -3/-3/-3 -2/-2/-2
    """)

MTL = textwrap.dedent("""\
    newmtl red
    Kd 0.9 0.1 0.1
    Ni 1.6
    Ns 200
    newmtl blue
    Kd 0.1 0.1 0.9
    d 0.5
    """)


@pytest.fixture()
def obj_scene(tmp_path):
    (tmp_path / "test.obj").write_text(OBJ)
    (tmp_path / "test.mtl").write_text(MTL)
    return load_obj(str(tmp_path / "test.obj"))


def test_shapes_and_instances(obj_scene):
    assert len(obj_scene.meshes) == 2
    assert len(obj_scene.instances) == 2
    assert obj_scene.meshes[0].name == "quad"
    # quad fan-triangulates into 2 triangles
    assert obj_scene.meshes[0].indices.shape == (2, 3)
    assert obj_scene.meshes[1].indices.shape == (1, 3)


def test_handedness_and_winding(obj_scene):
    m = obj_scene.meshes[0]
    # x negated
    assert m.positions[:, 0].min() == -1.0 and m.positions[:, 0].max() == 0.0
    # Normals from the file are untouched except the x component flip.
    np.testing.assert_allclose(m.normals[:, 2], 1.0)
    v = m.positions[m.indices[0]]
    gn = np.cross(v[2] - v[0], v[1] - v[0])
    # Reference parity: the x-negation (mirror) composed with the odd
    # winding permutation (WavefrontOBJLoading.cpp:185-187 swaps corners
    # 1,2) leaves cross(v0v2, v0v1) OPPOSING the imported vn for CCW RHS
    # input — the front face (det < 0 in RayPrimitiveIntersect) is the
    # side the LHS camera sees.
    assert np.dot(gn, m.normals[0]) < 0


def test_texcoord_v_flip(obj_scene):
    m = obj_scene.meshes[0]
    assert set(np.round(m.texcoords[:, 1], 5)) == {0.0, 1.0}
    # corner uv (0,0) became (0,1)
    first = m.texcoords[np.lexsort(m.positions.T)][0]
    assert first.shape == (2,)


def test_materials_translated(obj_scene):
    mats = {m.name: m for m in obj_scene.materials}
    assert set(mats) == {"red", "blue"}
    red = mats["red"]
    assert red.mtype == MATERIAL_TYPE_PLASTIC
    np.testing.assert_allclose(red.albedo, (0.9, 0.1, 0.1))
    np.testing.assert_allclose(red.ior[0], 1.6)
    assert 0.0 < red.roughness < 0.2      # Ns=200 is glossy
    assert mats["blue"].opacity == 0.5


def test_material_ids_per_face(obj_scene):
    assert obj_scene.meshes[0].material_ids.tolist() == [0, 0]
    assert obj_scene.meshes[1].material_ids.tolist() == [1]


def test_flattens_and_tangents(obj_scene):
    arrays, meta = flatten_scene(obj_scene)
    assert arrays.triangles.shape[0] == 3
    t = np.asarray(obj_scene.meshes[0].tangents)
    n = np.asarray(obj_scene.meshes[0].normals)
    # tangents orthogonal to normals and unit length where defined
    dots = np.abs(np.sum(t * n, axis=1))
    lens = np.linalg.norm(t, axis=1)
    assert np.all(dots < 1e-5)
    assert np.all((lens > 0.99) & (lens < 1.01))


def test_tangents_angle_weighted_and_handedness_split():
    """MikkTSpace properties: corner-angle weighting and per-handedness
    accumulation (mirrored-UV faces must not cancel a shared vertex's
    tangent to zero)."""
    import numpy as np

    from directcomputeraytracing_tpu.scene.obj_loader import (
        compute_tangents,
    )

    # flat quad in the XZ plane, UVs aligned with +X -> tangent = +-X
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]],
                     np.float32)
    nrm = np.tile(np.asarray([[0, 1, 0]], np.float32), (4, 1))
    uv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.asarray([[0, 1, 2], [0, 2, 3]])
    tan = compute_tangents(pos, nrm, uv, idx)
    assert np.allclose(np.abs(tan[:, 0]), 1.0, atol=1e-5)
    assert np.allclose(tan[:, 1:], 0.0, atol=1e-5)

    # vertex 0 shared by a mirrored-UV copy: the naive sum cancels,
    # the handedness-split keeps the majority frame (two unmirrored
    # faces vs one mirrored)
    pos2 = np.concatenate([pos, np.asarray([[-1, 0, 0], [-1, 0, 1]],
                                           np.float32)])
    nrm2 = np.tile(np.asarray([[0, 1, 0]], np.float32), (6, 1))
    uv2 = np.concatenate([uv, np.asarray([[1, 0], [1, 1]], np.float32)])
    idx2 = np.asarray([[0, 1, 2], [0, 2, 3], [0, 3, 5], [0, 5, 4]])
    tan2 = compute_tangents(pos2, nrm2, uv2, idx2)
    assert np.linalg.norm(tan2[0]) > 0.5  # not cancelled
