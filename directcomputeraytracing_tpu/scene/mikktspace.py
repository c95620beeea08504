"""Faithful MikkTSpace per-corner tangent generation.

Reimplements Morten Mikkelsen's algorithm as the reference consumes it
(reference: MikkTSpace/mikktspace.c `genTangSpaceDefault`, driven by
Source/WavefrontOBJLoading.cpp:147-152 with triangulated faces and the
default 180-degree angular threshold; per-corner tangents then key the
vertex dedup, WavefrontOBJLoading.cpp:215-218). Replaces the round-3
per-vertex approximation for the cases where they differ: tangents are
averaged only across faces connected through true shared EDGES (two
fans welded onto one vertex no longer blend), orientation (UV-mirror)
classes split exactly as the reference's group rules do, and
degenerate triangles inherit a neighbor corner's space.

Stages (mikktspace.c genTangSpace:229-420):
  1. weld corners on exact (position, normal, uv) equality
  2. mark degenerate triangles (any two welded-equal positions)
  3. per-triangle UV-gradient tangents, orientation + group-with-any
     flags (InitTriInfo:944-1007)
  4. 1:1 opposite-winding edge pairing into face neighbors
     (BuildNeighborsFast:1497-1594)
  5. connectivity groups per corner under the 4 rules
     (Build4RuleGroups:1069-1189, depth-first in the C call order —
     the only order-dependent step, kept bit-compatible)
  6. per-group subgroup split by the angular threshold, angle-weighted
     average per subgroup (GenerateTSpaces:1198-1365,
     EvalTspace:1367-1439)
  7. degenerate triangles copy a space from a good corner sharing
     their welded index (DegenEpilogue)

All in numpy with small Python loops at group scale; scene ingestion
is offline CPU work.
"""

import math

import numpy as np

_FLT_MIN = 1.17549435e-38  # mikktspace NotZero threshold


def _not_zero(x):
    return abs(x) > _FLT_MIN


def generate_tangents(pos, nrm, uv, angular_threshold_deg=180.0):
    """Per-corner MikkTSpace tangents.

    pos/nrm/uv: (F, 3, 3|3|2) float32 corner attributes (winding as
    rendered). Returns (tangents (F, 3, 3) float32, orient (F, 3) bool)
    where orient True means texture-space handedness is preserved
    (the reference's fSign = +1).
    """
    pos = np.ascontiguousarray(pos, np.float32)
    nrm = np.ascontiguousarray(nrm, np.float32)
    uv = np.ascontiguousarray(uv, np.float32)
    F = pos.shape[0]
    if F == 0:
        return (np.zeros((0, 3, 3), np.float32),
                np.zeros((0, 3), bool))
    thres_cos = float(math.cos(angular_threshold_deg * math.pi / 180.0))

    # ---- 1. weld corners on exact attribute equality ----------------
    rows = np.concatenate(
        [pos.reshape(-1, 3), nrm.reshape(-1, 3), uv.reshape(-1, 2)], 1)
    # exact bitwise equality modulo +-0.0 (the C code compares floats
    # with ==): canonicalise -0.0 to +0.0 before the row unique
    rows = rows + 0.0
    _, first, inv = np.unique(rows, axis=0, return_index=True,
                              return_inverse=True)
    widx = inv.reshape(F, 3)  # welded corner index per (face, corner)

    # position-only weld for the degenerate test and epilogue
    prow = pos.reshape(-1, 3) + 0.0
    _, pinv = np.unique(prow, axis=0, return_inverse=True)
    pwidx = pinv.reshape(F, 3)

    # ---- 2. degenerate triangles ------------------------------------
    degen = ((pwidx[:, 0] == pwidx[:, 1])
             | (pwidx[:, 0] == pwidx[:, 2])
             | (pwidx[:, 1] == pwidx[:, 2]))
    good = np.flatnonzero(~degen)
    G = good.shape[0]

    tan_out = np.zeros((F, 3, 3), np.float32)
    orient_out = np.zeros((F, 3), bool)
    if G == 0:
        tan_out[..., 0] = 1.0
        return tan_out, orient_out

    # good triangles, original relative order (DegenPrologue semantics)
    tw = widx[good]           # (G, 3) welded indices
    tp = pos[good]
    tn = nrm[good]
    tuv = uv[good]

    # ---- 3. per-triangle first-order derivatives --------------------
    d1 = tp[:, 1] - tp[:, 0]
    d2 = tp[:, 2] - tp[:, 0]
    t21 = tuv[:, 1] - tuv[:, 0]
    t31 = tuv[:, 2] - tuv[:, 0]
    area2 = t21[:, 0] * t31[:, 1] - t21[:, 1] * t31[:, 0]  # eq 18/19
    v_os = t31[:, 1:2] * d1 - t21[:, 1:2] * d2
    v_ot = -t31[:, 0:1] * d1 + t21[:, 0:1] * d2
    orient_pres = area2 > 0.0

    len_os = np.linalg.norm(v_os, axis=1)
    len_ot = np.linalg.norm(v_ot, axis=1)
    abs_area = np.abs(area2)
    nz_area = np.abs(area2) > _FLT_MIN
    sgn = np.where(orient_pres, 1.0, -1.0).astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        os_n = np.where((nz_area & (len_os > _FLT_MIN))[:, None],
                        v_os * (sgn / np.maximum(len_os, _FLT_MIN))[:, None],
                        0.0).astype(np.float32)
        ot_n = np.where((nz_area & (len_ot > _FLT_MIN))[:, None],
                        v_ot * (sgn / np.maximum(len_ot, _FLT_MIN))[:, None],
                        0.0).astype(np.float32)
        mag_s = np.where(nz_area, len_os / np.maximum(abs_area, _FLT_MIN),
                         0.0)
        mag_t = np.where(nz_area, len_ot / np.maximum(abs_area, _FLT_MIN),
                         0.0)
    group_with_any = ~(nz_area & (mag_s > _FLT_MIN) & (mag_t > _FLT_MIN))

    # ---- 4. neighbors: 1:1 opposite-winding edge pairing ------------
    # edge record per (tri, edgenum): directed (a, b) = (w[e], w[e+1]);
    # the C builder keys on (min, max) sorted by (i0, i1, f) and pairs
    # each unassigned edge with the first unassigned REVERSED edge of a
    # later record (face-ascending within the key group)
    neighbors = np.full((G, 3), -1, np.int64)
    ea = tw
    eb = tw[:, [1, 2, 0]]
    lo = np.minimum(ea, eb).ravel()
    hi = np.maximum(ea, eb).ravel()
    face_of = np.repeat(np.arange(G), 3)
    edge_of = np.tile(np.arange(3), G)
    order = np.lexsort((face_of, hi, lo))
    key = lo[order].astype(np.int64) * (hi.max() + 1) + hi[order]
    starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
    ends = np.r_[starts[1:], key.shape[0]]
    dira = ea.ravel()[order]  # directed first endpoint
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        grp = order[s:e]
        for ii in range(e - s):
            fi, ei = face_of[grp[ii]], edge_of[grp[ii]]
            if neighbors[fi, ei] != -1:
                continue
            for jj in range(ii + 1, e - s):
                fj, ej = face_of[grp[jj]], edge_of[grp[jj]]
                if neighbors[fj, ej] != -1:
                    continue
                if dira[s + jj] != dira[s + ii]:  # opposite winding
                    neighbors[fi, ei] = fj
                    neighbors[fj, ej] = fi
                    break

    # ---- 5. groups under the 4 rules (C call order) ------------------
    # per (face, corner): assigned group id or -1
    assigned = np.full((G, 3), -1, np.int64)
    flags_any = group_with_any.copy()
    flags_orient = orient_pres.copy()
    group_orient = []   # per group: orientation
    # flat assignment records, in assignment order: (gid, tri, corner)
    rec_g, rec_t, rec_i = [], [], []

    tw_list = tw.tolist()
    nb_list = neighbors.tolist()

    def corner_of(t, vrep):
        row = tw_list[t]
        if row[0] == vrep:
            return 0
        if row[1] == vrep:
            return 1
        if row[2] == vrep:
            return 2
        return -1

    def assign_seed_and_dfs(f, i, gid, vrep, g_orient):
        # seed assignment + iterative pre-order DFS matching
        # AssignRecur's L-then-R call order (mikktspace.c:1139-1189);
        # LIFO with R pushed first
        assigned[f, i] = gid
        rec_g.append(gid)
        rec_t.append(f)
        rec_i.append(i)
        stack = []
        nl = nb_list[f][i]
        nr = nb_list[f][i - 1 if i > 0 else 2]
        if nr >= 0:
            stack.append(nr)
        if nl >= 0:
            stack.append(nl)
        while stack:
            t = stack.pop()
            j = corner_of(t, vrep)
            if j < 0 or assigned[t, j] != -1:
                continue
            if flags_any[t]:
                # first group to reach a group-with-anything triangle
                # sets its orientation (the C order dependency)
                if (assigned[t] == -1).all():
                    flags_orient[t] = g_orient
            if bool(flags_orient[t]) != g_orient:
                continue
            assigned[t, j] = gid
            rec_g.append(gid)
            rec_t.append(t)
            rec_i.append(j)
            nl = nb_list[t][j]
            nr = nb_list[t][j - 1 if j > 0 else 2]
            if nr >= 0:
                stack.append(nr)
            if nl >= 0:
                stack.append(nl)

    for f in range(G):
        if flags_any[f]:
            continue
        for i in range(3):
            if assigned[f, i] != -1:
                continue
            gid = len(group_orient)
            g_orient = bool(flags_orient[f])
            group_orient.append(g_orient)
            assign_seed_and_dfs(f, i, gid, int(tw[f, i]), g_orient)

    # ---- 6. subgroups + angle-weighted spaces ------------------------
    tan_g = np.zeros((G, 3, 3), np.float32)
    orient_g = np.zeros((G, 3), bool)

    rec_g = np.asarray(rec_g, np.int64)
    rec_t = np.asarray(rec_t, np.int64)
    rec_i = np.asarray(rec_i, np.int64)
    if rec_g.shape[0]:
        # global precompute per assignment record: the group normal is
        # the record's own corner normal (all members of a group share
        # the welded rep, hence the identical normal bits)
        n_rec = tn[rec_t, rec_i]                       # (R, 3)

        def _proj_norm(vecs):
            v = vecs - np.sum(vecs * n_rec, 1, keepdims=True) * n_rec
            l = np.linalg.norm(v, axis=1, keepdims=True)
            return np.where(l > _FLT_MIN, v / np.maximum(l, _FLT_MIN), v)

        proj_s = _proj_norm(os_n[rec_t])               # (R, 3)
        proj_t = _proj_norm(ot_n[rec_t])
        # corner angle between the projected edges (EvalTspace:1410-17)
        p1 = tp[rec_t, rec_i]
        p0 = tp[rec_t, (rec_i - 1) % 3]
        p2 = tp[rec_t, (rec_i + 1) % 3]
        v1 = _proj_norm(p0 - p1)
        v2 = _proj_norm(p2 - p1)
        ang = np.arccos(np.clip(np.sum(v1 * v2, 1), -1.0, 1.0))
        any_m = flags_any[rec_t]
        w_os = np.where(any_m[:, None], 0.0, ang[:, None] * proj_s)

        # group-by gid (records already gid-sorted per seed order, but
        # DFS from later seeds can append to earlier gids? no — a group
        # is fully built before the next seed; records are contiguous)
        starts = np.flatnonzero(np.r_[True, rec_g[1:] != rec_g[:-1]])
        ends = np.r_[starts[1:], rec_g.shape[0]]
        for s, e in zip(starts, ends):
            k = e - s
            gid = rec_g[s]
            g_orient = group_orient[gid]
            tt = rec_t[s:e]
            ii = rec_i[s:e]
            P = proj_s[s:e]
            Q = proj_t[s:e]
            if k == 1:
                sub = w_os[s:e].sum(0)
                l = np.linalg.norm(sub)
                tan_g[tt[0], ii[0]] = (sub / l if l > _FLT_MIN
                                       else sub)
                orient_g[tt[0], ii[0]] = g_orient
                continue
            b_any = any_m[s:e]
            # (k, k) membership: bAny(f)|bAny(t)|same|angular pass
            cs = P @ P.T
            ct = Q @ Q.T
            memb = (b_any[:, None] | b_any[None, :]
                    | np.eye(k, dtype=bool)
                    | ((cs > thres_cos) & (ct > thres_cos)))
            # identical member rows share one averaged space
            _, row_first, row_inv = np.unique(
                memb, axis=0, return_index=True, return_inverse=True)
            sub = memb[row_first].astype(np.float32) @ w_os[s:e]
            l = np.linalg.norm(sub, axis=1, keepdims=True)
            sub = np.where(l > _FLT_MIN, sub / np.maximum(l, _FLT_MIN),
                           sub)
            tan_g[tt, ii] = sub[row_inv]
            orient_g[tt, ii] = g_orient

    # unassigned corners (group-with-any faces no group ever reached)
    # keep the default space (mikktspace.c:340-344, memset bOrient=0)
    un = assigned == -1
    tan_g[un] = np.asarray([1.0, 0.0, 0.0], np.float32)
    orient_g[un] = False

    tan_out[good] = tan_g
    orient_out[good] = orient_g

    # ---- 7. degenerate epilogue --------------------------------------
    if degen.any():
        # map welded corner index -> (good face, corner)
        wmap = {}
        for gi in range(G):
            for i in range(3):
                wmap.setdefault(int(tw[gi, i]), (int(good[gi]), i))
        for f in np.flatnonzero(degen):
            for i in range(3):
                src = wmap.get(int(widx[f, i]))
                if src is not None:
                    tan_out[f, i] = tan_out[src[0], src[1]]
                    orient_out[f, i] = orient_out[src[0], src[1]]
                else:
                    tan_out[f, i] = (1.0, 0.0, 0.0)
    return tan_out, orient_out


def corner_tangents_for_mesh(positions, normals, texcoords, indices):
    """Per-corner tangents for an indexed triangle mesh: gathers corner
    attributes, runs `generate_tangents`. Returns (F, 3, 3) float32."""
    pos = positions[indices]
    nrm = normals[indices]
    uvc = texcoords[indices]
    tan, _orient = generate_tangents(pos, nrm, uvc)
    return tan
