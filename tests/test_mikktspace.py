"""Exact MikkTSpace tangent generation (scene/mikktspace.py), the
reference's MikkTSpace/mikktspace.c via WavefrontOBJLoading.cpp:147-152
(triangulated faces, default 180-degree threshold). Pins the behaviors
that separate it from the round-3 per-vertex approximation: edge
connectivity (two fans welded on one vertex don't blend), orientation
groups (mirrored UVs), degenerate-triangle inheritance, and the
angle-weighted average itself."""

import numpy as np
import pytest

from directcomputeraytracing_tpu.scene.mikktspace import (
    corner_tangents_for_mesh, generate_tangents,
)


def _quad(u0=0.0, u1=1.0, flip_u=False):
    """Two triangles forming a unit quad in the XY plane, +Z normal,
    UVs an affine map of XY."""
    P = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                   np.float32)
    N = np.tile(np.asarray([0, 0, 1], np.float32), (4, 1))
    u = np.asarray([u0, u1, u1, u0], np.float32)
    if flip_u:
        u = 1.0 - u
    UV = np.stack([u, np.asarray([0, 0, 1, 1], np.float32)], 1)
    idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int64)
    return P[idx], N[idx], UV[idx]


def test_flat_quad_tangent_follows_u():
    pos, nrm, uv = _quad()
    tan, orient = generate_tangents(pos, nrm, uv)
    # dP/du = +X everywhere; both triangles one group per corner
    assert np.allclose(tan, [1, 0, 0], atol=1e-6), tan
    assert orient.all()  # UV winding matches geometric winding


def test_mirrored_uv_flips_orientation():
    pos, nrm, uv = _quad(flip_u=True)
    tan, orient = generate_tangents(pos, nrm, uv)
    assert np.allclose(tan, [-1, 0, 0], atol=1e-6), tan
    assert not orient.any()


def test_angle_weighted_average():
    """Three coplanar triangles fanning around a center vertex with a
    continuous piecewise-linear UV map whose per-face gradient varies:
    the shared corner's tangent is the angle-weighted average of the
    normalized per-face dP/du directions (weights = fan angles)."""
    c = np.zeros(3, np.float32)
    angs = [0.0, 0.5, 1.3, 2.2]  # radians, unequal fan angles
    ring = np.asarray([[np.cos(a), np.sin(a), 0.0] for a in angs],
                      np.float32)
    F = 3
    pos = np.stack([np.stack([c, ring[k], ring[k + 1]])
                    for k in range(F)])
    nrm = np.tile(np.asarray([0, 0, 1], np.float32), (F, 3, 1))
    # per-VERTEX uv values (continuous across shared edges), chosen so
    # per-face gradients differ
    uv_c = np.asarray([0.0, 0.0], np.float32)
    uv_ring = np.asarray([[1.0, 0.0], [0.8, 0.6], [0.2, 0.9],
                          [-0.4, 1.1]], np.float32)
    uv = np.stack([np.stack([uv_c, uv_ring[k], uv_ring[k + 1]])
                   for k in range(F)])
    tan, orient = generate_tangents(pos, nrm, uv)

    # independent expectation: solve each face's affine UV map for
    # dP/du, normalize (normal is +Z so projection is a no-op),
    # angle-weight by the fan angle at the center
    dirs, ws = [], []
    for k in range(F):
        A = np.stack([uv[k, 1] - uv[k, 0], uv[k, 2] - uv[k, 0]])
        E = np.stack([pos[k, 1] - pos[k, 0], pos[k, 2] - pos[k, 0]])
        dpdu = np.linalg.solve(A.astype(np.float64), E.astype(
            np.float64))[0]
        dirs.append(dpdu / np.linalg.norm(dpdu))
        ws.append(angs[k + 1] - angs[k])
    expect = (np.asarray(ws)[:, None] * np.asarray(dirs)).sum(0)
    expect /= np.linalg.norm(expect)
    for k in range(F):
        assert np.allclose(tan[k, 0], expect, atol=1e-5), (k, tan[k, 0])
    # a ring corner shared by two faces averages those two only,
    # weighted by each triangle's corner angle AT THAT corner
    def corner_angle(k, j):
        a = pos[k, (j - 1) % 3] - pos[k, j]
        b = pos[k, (j + 1) % 3] - pos[k, j]
        return np.arccos(np.clip(
            np.dot(a, b) / np.linalg.norm(a) / np.linalg.norm(b),
            -1, 1))

    e2 = corner_angle(0, 2) * dirs[0] + corner_angle(1, 1) * dirs[1]
    e2 /= np.linalg.norm(e2)
    assert np.allclose(tan[0, 2], e2, atol=1e-5), (tan[0, 2], e2)
    assert np.allclose(tan[1, 1], e2, atol=1e-5)


def test_disconnected_fans_do_not_blend():
    """Two triangles touching at ONE welded vertex but sharing no edge:
    mikktspace puts them in separate groups (connectivity rule), so the
    shared corner gets each face's own tangent — the round-3
    approximation would average them."""
    # face A in XY plane, u along +X; face B also +Z normal, u along +Y
    A = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    B = np.asarray([[0, 0, 0], [-1, 0, 0], [0, -1, 0]], np.float32)
    pos = np.stack([A, B])
    nrm = np.tile(np.asarray([0, 0, 1], np.float32), (2, 3, 1))
    uvA = np.asarray([[0, 0], [1, 0], [0, 1]], np.float32)
    uvB = np.asarray([[0, 0], [0, 1], [-1, 0]], np.float32)  # u = y
    uv = np.stack([uvA, uvB])
    tan, orient = generate_tangents(pos, nrm, uv)
    assert np.allclose(tan[0, 0], [1, 0, 0], atol=1e-6), tan[0, 0]
    assert np.allclose(tan[1, 0], [0, 1, 0], atol=1e-5), tan[1, 0]


def test_shared_edge_blends():
    """Control for the fan test: tangent frames DO average across a
    genuinely shared edge (welded endpoints, opposite winding). Face 1
    gets a sheared UV map that agrees with face 0 on the shared
    diagonal but has a different dP/du."""
    pos, nrm, uv = _quad()
    uv2 = uv.copy()
    for j in range(3):
        x, y = pos[1, j, 0], pos[1, j, 1]
        # u = .8x + .2y, v = .2x + .8y: equals face 0's (x, y) on the
        # x == y diagonal; orientation preserved (det = 0.6 > 0)
        uv2[1, j] = [0.8 * x + 0.2 * y, 0.2 * x + 0.8 * y]
    tan, _ = generate_tangents(pos, nrm, uv2)
    # face 1's own dP/du direction (inverse of the shear)
    d1 = np.asarray([0.8, -0.2, 0.0])
    d1 /= np.linalg.norm(d1)
    # shared corners see the same averaged tangent from both faces,
    # strictly between the two per-face directions
    shared_a = tan[0, 0]   # (0,0,0) on face 0
    shared_b = tan[1, 0]   # (0,0,0) on face 1
    assert np.allclose(shared_a, shared_b, atol=1e-6)
    assert shared_a[1] < -1e-3 and shared_a[1] > d1[1], shared_a
    # the unshared corners keep their own face's direction
    assert np.allclose(tan[0, 1], [1, 0, 0], atol=1e-6)
    assert np.allclose(tan[1, 2], d1, atol=1e-5), tan[1, 2]


def test_degenerate_inherits_neighbor_space():
    pos, nrm, uv = _quad()
    # append a zero-area triangle welded to vertex (0,0,0)
    dp = np.asarray([[[0, 0, 0], [0, 0, 0], [1, 0, 0]]], np.float32)
    dn = np.tile(np.asarray([0, 0, 1], np.float32), (1, 3, 1))
    duv = np.asarray([[[0, 0], [0, 0], [1, 0]]], np.float32)
    tan, orient = generate_tangents(
        np.concatenate([pos, dp]), np.concatenate([nrm, dn]),
        np.concatenate([uv, duv]))
    assert np.allclose(tan[:2], [1, 0, 0], atol=1e-6)
    # degenerate corners welded to good corners copy their space
    assert np.allclose(tan[2, 0], [1, 0, 0], atol=1e-6), tan[2]


def test_bad_uv_face_groups_with_anything():
    """A face with zero UV area (GROUP_WITH_ANY) joins its neighbor's
    group and adopts its orientation instead of poisoning it."""
    pos, nrm, uv = _quad()
    uv2 = uv.copy()
    uv2[1] = 0.0  # face 1 has no UV extent
    tan, orient = generate_tangents(pos, nrm, uv2)
    # face 0 unaffected
    assert np.allclose(tan[0], [1, 0, 0], atol=1e-6)
    # face 1's corners shared with face 0 inherit the group space
    assert np.allclose(tan[1, 0], [1, 0, 0], atol=1e-6), tan[1]
    assert np.allclose(tan[1, 1], [1, 0, 0], atol=1e-6)


def test_corner_tangents_for_mesh_indexed():
    P = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                   np.float32)
    N = np.tile(np.asarray([0, 0, 1], np.float32), (4, 1))
    UV = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int64)
    tan = corner_tangents_for_mesh(P, N, UV, idx)
    assert tan.shape == (2, 3, 3)
    assert np.allclose(tan, [1, 0, 0], atol=1e-6)


def test_matches_approximation_on_simple_closed_mesh():
    """On a clean connected mesh with consistent UVs the exact
    algorithm and the round-3 per-vertex approximation agree (both are
    angle-weighted averages of the same per-face tangents)."""
    from directcomputeraytracing_tpu.scene.obj_loader import (
        compute_tangents,
    )

    # a 4x4 grid in the XZ plane with u ~ x, v ~ z
    n = 5
    xs, zs = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n),
                         indexing="ij")
    P = np.stack([xs.ravel(), np.zeros(n * n), zs.ravel()],
                 1).astype(np.float32)
    N = np.tile(np.asarray([0, 1, 0], np.float32), (n * n, 1))
    UV = np.stack([xs.ravel(), zs.ravel()], 1).astype(np.float32)
    quads = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            quads += [[a, a + 1, a + n + 1], [a, a + n + 1, a + n]]
    idx = np.asarray(quads, np.int64)
    exact = corner_tangents_for_mesh(P, N, UV, idx)
    approx = compute_tangents(P, N, UV, idx)
    # compare per corner against the approximation's per-vertex value
    err = np.abs(exact - approx[idx]).max()
    assert err < 1e-4, err


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q"]))
