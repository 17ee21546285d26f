"""ctypes bindings for the native host ops (hostops.c), with NumPy fallback.

Build: ``make -C box2mask_tpu/native`` (or it builds lazily on first use when
a compiler is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, 'libhostops.so')
_lib = None
_tried = False


def _build():
    src = os.path.join(_DIR, 'hostops.c')
    cmd = ['cc', '-O3', '-shared', '-fPIC', '-o', _SO, src, '-lm']
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except Exception:
        return False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or (os.path.getmtime(_SO) <
                                   os.path.getmtime(os.path.join(_DIR,
                                                                 'hostops.c'))):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.b2m_voxelize.restype = ctypes.c_int32
        lib.b2m_voxelize.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        lib.b2m_unpack_masks.restype = None
        lib.b2m_unpack_masks.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
    except (OSError, AttributeError):
        _lib = None
    return _lib


def native_voxelize(scaled_points):
    """(vox_coords (V,3) i32, vox2point (P,) i32, point2vox (V,) i32) or None
    when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(scaled_points, np.float32)
    P = len(pts)
    vox_coords = np.empty((P, 3), np.int32)
    vox2point = np.empty(P, np.int32)
    point2vox = np.empty(P, np.int32)
    V = lib.b2m_voxelize(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), P,
        vox_coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vox2point.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        point2vox.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if V < 0:
        return None
    return vox_coords[:V].copy(), vox2point, point2vox[:V].copy()


def native_unpack_masks(packed, base_byte, vox2point):
    """Point masks (R, P) uint8 from bit-packed voxel masks: fused bit test +
    vox->point projection (one C pass instead of unpackbits + two fancy-index
    copies — the post-readback hot loop of device_post). None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed, np.uint8)
    v2p = np.ascontiguousarray(vox2point, np.int32)
    R, stride = packed.shape
    P = len(v2p)
    out = np.empty((R, P), np.uint8)
    lib.b2m_unpack_masks(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        np.int32(R), np.int32(stride), np.int32(base_byte),
        v2p.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        np.int32(P),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out
