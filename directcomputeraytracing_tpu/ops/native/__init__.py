"""Native (C++) runtime components, loaded via ctypes.

The reference implements its scene-load-time machinery (BVH build,
loaders) in C++ (reference: Source/BVHAccel.cpp); this package holds the
TPU build's native equivalents, compiled on demand with g++ and cached
next to the sources. Every native entry point has a NumPy fallback — the
native path is an accelerator, not a hard dependency.
"""

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bvh_builder.cpp")
_SO = os.path.join(_DIR, "_dcrt_native.so")


def _compile():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO + ".tmp"]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_SO + ".tmp", _SO)


def load_native():
    """Returns the loaded ctypes library, or None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _compile()
            lib = ctypes.CDLL(_SO)
            import numpy.ctypeslib as npc
            import numpy as np

            f32 = npc.ndpointer(np.float32, flags="C_CONTIGUOUS")
            u32 = npc.ndpointer(np.uint32, flags="C_CONTIGUOUS")
            i64 = npc.ndpointer(np.int64, flags="C_CONTIGUOUS")
            i32 = npc.ndpointer(np.int32, flags="C_CONTIGUOUS")
            lib.dcrt_build_bvh.restype = ctypes.c_int
            lib.dcrt_build_bvh.argtypes = [
                f32, f32, ctypes.c_int64, ctypes.c_int32,
                f32, f32, u32, u32, i64, i32,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def build_bvh_native(prim_bbox_min, prim_bbox_max, max_prims_in_node=2):
    """C++ SAH build with the same node layout as accel.build.build_bvh.
    Returns a BVH dataclass or None if the native library is unavailable."""
    import numpy as np

    lib = load_native()
    if lib is None:
        return None
    from ...accel.build import BVH

    pmin = np.ascontiguousarray(prim_bbox_min, np.float32)
    pmax = np.ascontiguousarray(prim_bbox_max, np.float32)
    n = pmin.shape[0]
    cap = 2 * n
    out_min = np.empty((cap, 3), np.float32)
    out_max = np.empty((cap, 3), np.float32)
    out_rop = np.empty(cap, np.uint32)
    out_misc = np.empty(cap, np.uint32)
    out_order = np.empty(n, np.int64)
    out_depths = np.empty(n, np.int32)
    node_count = ctypes.c_int64()
    max_depth = ctypes.c_int32()
    rc = lib.dcrt_build_bvh(pmin, pmax, n, max_prims_in_node,
                            out_min, out_max, out_rop, out_misc,
                            out_order, out_depths,
                            ctypes.byref(node_count),
                            ctypes.byref(max_depth))
    if rc != 0:
        return None
    k = node_count.value
    return BVH(bbox_min=out_min[:k].copy(), bbox_max=out_max[:k].copy(),
               right_or_prim=out_rop[:k].copy(), misc=out_misc[:k].copy(),
               prim_order=out_order, max_depth=max_depth.value,
               leaf_depths=out_depths)
