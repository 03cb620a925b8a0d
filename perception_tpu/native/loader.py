"""ctypes bridge to the native mesh loader (libperception_mesh.so).

Auto-builds the library on first use when a toolchain is present; callers
fall back to the pure-Python reader when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libperception_mesh.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load_library():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.pt_load_mesh.restype = ctypes.c_int
        lib.pt_load_mesh.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.pt_free.argtypes = [ctypes.c_void_p]
        lib.pt_last_error.restype = ctypes.c_char_p
        if hasattr(lib, "pt_decimate_qem"):   # absent in stale builds
            lib.pt_decimate_qem.restype = ctypes.c_int
            lib.pt_decimate_qem.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_long,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
                ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
                ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.c_int),
            ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load_library() is not None


def qem_available() -> bool:
    lib = _load_library()
    return lib is not None and hasattr(lib, "pt_decimate_qem")


def decimate_qem_native(verts, faces, colors, target_faces: int):
    """QEM decimation via the C++ implementation (~100x the Python one).

    verts [V,3] f64, faces [F,3] i64, colors [V,3] u8|None ->
    (verts, faces, colors|None). Raises RuntimeError when unavailable.
    """
    lib = _load_library()
    if lib is None or not hasattr(lib, "pt_decimate_qem"):
        raise RuntimeError("native QEM unavailable")
    verts = np.ascontiguousarray(verts, np.float64)
    faces = np.ascontiguousarray(faces, np.int64)
    cols = (np.ascontiguousarray(np.clip(colors, 0, 255), np.uint8)
            if colors is not None else None)

    out_v = ctypes.POINTER(ctypes.c_double)()
    out_f = ctypes.POINTER(ctypes.c_int64)()
    out_c = ctypes.POINTER(ctypes.c_uint8)()
    n_v = ctypes.c_long()
    n_f = ctypes.c_long()
    has_c = ctypes.c_int()
    rc = lib.pt_decimate_qem(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(verts),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(faces),
        (cols.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
         if cols is not None else None),
        target_faces,
        ctypes.byref(out_v), ctypes.byref(n_v),
        ctypes.byref(out_f), ctypes.byref(n_f),
        ctypes.byref(out_c), ctypes.byref(has_c))
    if rc != 0:
        raise RuntimeError("native QEM decimation failed")
    try:
        dv = np.ctypeslib.as_array(out_v, shape=(n_v.value, 3)).copy()
        df = np.ctypeslib.as_array(out_f, shape=(n_f.value, 3)).copy()
        dc = (np.ctypeslib.as_array(out_c, shape=(n_v.value, 3)).copy()
              if has_c.value else None)
    finally:
        lib.pt_free(out_v)
        lib.pt_free(out_f)
        if has_c.value:
            lib.pt_free(out_c)
    return dv, df, dc


def load_mesh_native(path: str, target_faces: int = 0):
    """Load (and optionally decimate) a mesh via the C++ loader.

    Returns (verts [V,3] f64, faces [F,3] i64, colors [V,3] u8 | None) or
    raises RuntimeError.
    """
    lib = _load_library()
    if lib is None:
        raise RuntimeError("native mesh loader unavailable")

    verts_p = ctypes.POINTER(ctypes.c_double)()
    faces_p = ctypes.POINTER(ctypes.c_int64)()
    colors_p = ctypes.POINTER(ctypes.c_uint8)()
    n_verts = ctypes.c_long()
    n_faces = ctypes.c_long()
    has_colors = ctypes.c_int()

    rc = lib.pt_load_mesh(
        path.encode(), target_faces,
        ctypes.byref(verts_p), ctypes.byref(n_verts),
        ctypes.byref(faces_p), ctypes.byref(n_faces),
        ctypes.byref(colors_p), ctypes.byref(has_colors))
    if rc != 0:
        raise RuntimeError(
            f"native mesh load failed: {lib.pt_last_error().decode()}")
    try:
        verts = np.ctypeslib.as_array(
            verts_p, shape=(n_verts.value, 3)).copy()
        faces = np.ctypeslib.as_array(
            faces_p, shape=(n_faces.value, 3)).copy()
        colors = None
        if has_colors.value:
            colors = np.ctypeslib.as_array(
                colors_p, shape=(n_verts.value, 3)).copy()
    finally:
        lib.pt_free(verts_p)
        lib.pt_free(faces_p)
        if has_colors.value:
            lib.pt_free(colors_p)
    return verts, faces, colors
