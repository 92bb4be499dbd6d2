"""ctypes loader for the native library, with lazy build + graceful fallback.

``marching_tets_native(sdf, level, origin, spacing)`` mirrors the signature of
``ops.marching.marching_tets``; returns None when the native path is
unavailable so callers can fall back to numpy.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("RA_TPU_NO_NATIVE", "0") == "1":
        return None
    from relightableavatar_tpu.native.build import build
    so = build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.ra_marching_tets.restype = ctypes.c_int
    lib.ra_marching_tets.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_float, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.ra_free.argtypes = [ctypes.c_void_p]
    lib.ra_decimate.restype = ctypes.c_int
    lib.ra_decimate.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    _LIB = lib
    return _LIB


def marching_tets_native(sdf: np.ndarray, level: float = 0.0,
                         origin=(0.0, 0.0, 0.0), spacing=(1.0, 1.0, 1.0)):
    lib = _load()
    if lib is None:
        return None
    sdf = np.ascontiguousarray(sdf, np.float32)
    X, Y, Z = sdf.shape
    origin = np.ascontiguousarray(origin, np.float32)
    spacing = np.ascontiguousarray(spacing, np.float32)
    vp = ctypes.POINTER(ctypes.c_float)()
    fp = ctypes.POINTER(ctypes.c_int64)()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.ra_marching_tets(
        sdf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), X, Y, Z,
        ctypes.c_float(level),
        origin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        spacing.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(vp), ctypes.byref(nv), ctypes.byref(fp), ctypes.byref(nf))
    if rc != 0:
        return None
    try:
        if nv.value == 0:
            return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64))
        V = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy()
        F = np.ctypeslib.as_array(fp, shape=(nf.value, 3)).copy()
        return V, F
    finally:
        if nv.value:
            lib.ra_free(vp)
        if nf.value:
            lib.ra_free(fp)


def decimate_native(verts: np.ndarray, faces: np.ndarray, target_faces: int):
    """QEM edge-collapse decimation (decimate.cpp); None when the native
    library is unavailable (callers fall back to vertex clustering)."""
    lib = _load()
    if lib is None or not hasattr(lib, 'ra_decimate'):
        return None
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int64)
    vp = ctypes.POINTER(ctypes.c_float)()
    fp = ctypes.POINTER(ctypes.c_int64)()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.ra_decimate(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(verts),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(faces),
        ctypes.c_int64(int(target_faces)),
        ctypes.byref(vp), ctypes.byref(nv), ctypes.byref(fp), ctypes.byref(nf))
    if rc != 0:
        return None
    try:
        if nv.value == 0:
            return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64))
        V = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy()
        F = np.ctypeslib.as_array(fp, shape=(nf.value, 3)).copy()
        return V, F
    finally:
        lib.ra_free(vp)
        lib.ra_free(fp)
