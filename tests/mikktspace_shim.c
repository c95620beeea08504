/* Test-only ctypes shim around the reference's vendored MikkTSpace
 * library (compiled at test time from /root/reference/MikkTSpace —
 * never copied into this repo): flat (F, 3, k) corner arrays in,
 * per-corner tangent + fSign out via m_setTSpaceBasic, exactly the
 * callback set the reference uses (Source/WavefrontOBJLoading.cpp:
 * 88-153). Built by tests/test_mikktspace_oracle.py.
 */
#include "mikktspace.h"

typedef struct {
    const float *pos;   /* (F, 3, 3) */
    const float *nrm;   /* (F, 3, 3) */
    const float *uv;    /* (F, 3, 2) */
    int nfaces;
    float *out_tan;     /* (F, 3, 3) */
    float *out_sign;    /* (F, 3) */
} SShimMesh;

static int shim_get_num_faces(const SMikkTSpaceContext *ctx)
{
    return ((const SShimMesh *)ctx->m_pUserData)->nfaces;
}

static int shim_get_num_verts(const SMikkTSpaceContext *ctx, int face)
{
    (void)ctx; (void)face;
    return 3;
}

static void shim_get_position(const SMikkTSpaceContext *ctx, float out[],
                              int face, int vert)
{
    const SShimMesh *m = (const SShimMesh *)ctx->m_pUserData;
    const float *p = m->pos + (face * 3 + vert) * 3;
    out[0] = p[0]; out[1] = p[1]; out[2] = p[2];
}

static void shim_get_normal(const SMikkTSpaceContext *ctx, float out[],
                            int face, int vert)
{
    const SShimMesh *m = (const SShimMesh *)ctx->m_pUserData;
    const float *p = m->nrm + (face * 3 + vert) * 3;
    out[0] = p[0]; out[1] = p[1]; out[2] = p[2];
}

static void shim_get_texcoord(const SMikkTSpaceContext *ctx, float out[],
                              int face, int vert)
{
    const SShimMesh *m = (const SShimMesh *)ctx->m_pUserData;
    const float *p = m->uv + (face * 3 + vert) * 2;
    out[0] = p[0]; out[1] = p[1];
}

static void shim_set_tspace_basic(const SMikkTSpaceContext *ctx,
                                  const float tangent[], float sign,
                                  int face, int vert)
{
    SShimMesh *m = (SShimMesh *)ctx->m_pUserData;
    float *t = m->out_tan + (face * 3 + vert) * 3;
    t[0] = tangent[0]; t[1] = tangent[1]; t[2] = tangent[2];
    m->out_sign[face * 3 + vert] = sign;
}

int dcrt_mikktspace_oracle(const float *pos, const float *nrm,
                           const float *uv, int nfaces,
                           float *out_tan, float *out_sign)
{
    SShimMesh mesh = {pos, nrm, uv, nfaces, out_tan, out_sign};
    SMikkTSpaceInterface iface = {0};
    SMikkTSpaceContext ctx;
    iface.m_getNumFaces = shim_get_num_faces;
    iface.m_getNumVerticesOfFace = shim_get_num_verts;
    iface.m_getPosition = shim_get_position;
    iface.m_getNormal = shim_get_normal;
    iface.m_getTexCoord = shim_get_texcoord;
    iface.m_setTSpaceBasic = shim_set_tspace_basic;
    ctx.m_pInterface = &iface;
    ctx.m_pUserData = &mesh;
    return genTangSpaceDefault(&ctx) ? 0 : 1;
}
