"""ctypes bindings for the native runtime components (native/*.cpp).

The compute path is JAX/XLA; host-side runtime pieces (currently the
marching-tetrahedra mesher) are C++ with a plain-C ABI, auto-built with
g++ on first use and loaded through ctypes.  Everything has a pure-numpy
fallback so the framework works without a compiler."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_NATIVE_DIR, "libmesher.so")
    src = os.path.join(_NATIVE_DIR, "mesher.cpp")
    stale = (
        os.path.exists(so) and os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(so)
    )
    if not os.path.exists(so) or stale:
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
                 "-std=c++17", src, "-o", so],
                check=True, capture_output=True, timeout=180,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.extract_mesh.restype = ctypes.c_int64
        lib.extract_mesh.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_float, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def extract_mesh_native(vol, require_weight: bool = True,
                        max_verts: int = 20_000_000, algo: str = "mt"):
    """Native mesh extraction; returns (verts [V,3], colors [V,3]) or None
    when the native library is unavailable.  algo: "mt" (marching
    tetrahedra) or "mc" (classic marching cubes; the 256-case table is
    generated in meshing.py and handed to the C++ side)."""
    lib = _load()
    if lib is None:
        return None
    if algo == "mc":
        from .meshing import _MC_TRI

        mc_tri = np.ascontiguousarray(_MC_TRI, np.int8)
    else:
        mc_tri = np.zeros(1, np.int8)
    tk = np.ascontiguousarray(np.asarray(vol.table_keys).reshape(-1), np.uint32)
    tp = np.ascontiguousarray(np.asarray(vol.table_ptrs).reshape(-1), np.int32)
    bc = np.ascontiguousarray(np.asarray(vol.block_coords), np.uint32)
    st_np = np.asarray(vol.state)
    sdf_i = (st_np & 0xFFFF).astype(np.int32)
    sdf_i = np.where(sdf_i >= 32768, sdf_i - 65536, sdf_i)
    sdf = np.ascontiguousarray(sdf_i.astype(np.float32) / 32767.0, np.float32)
    w = np.ascontiguousarray(
        ((st_np >> 16) & 0xFF).astype(np.int16), np.int16)
    from .volume import unpack_color_np

    col = np.ascontiguousarray(unpack_color_np(vol.color), np.uint8)
    n_blocks = int(vol.n_blocks)
    out_v = np.empty((max_verts, 3), np.float32)
    out_c = np.empty((max_verts, 3), np.float32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    n = lib.extract_mesh(
        ptr(tk, ctypes.c_uint32), ptr(tp, ctypes.c_int32),
        ctypes.c_int64(tk.shape[0]), ctypes.c_int(vol.params.max_probes),
        ptr(bc, ctypes.c_uint32), ptr(sdf, ctypes.c_float),
        ptr(w, ctypes.c_int16), ptr(col, ctypes.c_uint8),
        ctypes.c_int64(n_blocks), ctypes.c_float(vol.params.voxel_size),
        ctypes.c_int(1 if require_weight else 0),
        ctypes.c_int(1 if algo == "mc" else 0), ptr(mc_tri, ctypes.c_int8),
        ptr(out_v, ctypes.c_float), ptr(out_c, ctypes.c_float),
        ctypes.c_int64(max_verts),
    )
    n = int(n)
    return out_v[:n].copy(), out_c[:n].copy()
