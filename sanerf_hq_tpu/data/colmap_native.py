"""ctypes bindings for the native C++ COLMAP reader (csrc/colmap_reader.cpp).

Auto-builds libcolmap_reader.so with `make -C csrc` on first use; falls back
to the pure-Python readers in colmap.py when no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

from .colmap import Camera, Image, Point3D, MODEL_BY_ID

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_SO = os.path.join(_CSRC, "libcolmap_reader.so")
_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.read_cameras_bin.restype = ctypes.c_longlong
    lib.probe_images_bin.restype = ctypes.c_int
    lib.read_images_bin.restype = ctypes.c_longlong
    lib.probe_points3d_bin.restype = ctypes.c_int
    lib.read_points3d_bin.restype = ctypes.c_longlong
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def _ptr(a):
    return a.ctypes.data_as(ctypes.c_void_p)


def read_cameras_native(path: str) -> Dict[int, Camera]:
    lib = _load()
    cap = 1 << 16
    ids = np.zeros(cap, np.int32)
    model_ids = np.zeros(cap, np.int32)
    widths = np.zeros(cap, np.int64)
    heights = np.zeros(cap, np.int64)
    params = np.zeros(cap * 12, np.float64)
    offs = np.zeros(cap + 1, np.int64)
    n = lib.read_cameras_bin(path.encode(), cap, params.size, _ptr(ids),
                             _ptr(model_ids), _ptr(widths), _ptr(heights),
                             _ptr(params), _ptr(offs))
    if n < 0:
        raise IOError(f"native camera read failed: {path}")
    cams = {}
    for i in range(n):
        model = MODEL_BY_ID[int(model_ids[i])]
        p = params[offs[i]:offs[i + 1]].copy()
        cams[int(ids[i])] = Camera(int(ids[i]), model.model_name,
                                   int(widths[i]), int(heights[i]), p)
    return cams


def read_images_native(path: str) -> Dict[int, Image]:
    lib = _load()
    counts = np.zeros(2, np.int64)
    if lib.probe_images_bin(path.encode(), _ptr(counts)) != 0:
        raise IOError(f"native image probe failed: {path}")
    n, total2d = int(counts[0]), int(counts[1])
    CAP_NAME = 512
    ids = np.zeros(n, np.int32)
    qvecs = np.zeros((n, 4), np.float64)
    tvecs = np.zeros((n, 3), np.float64)
    cam_ids = np.zeros(n, np.int32)
    names = np.zeros(n * CAP_NAME, np.uint8)
    p2d_offs = np.zeros(n + 1, np.int64)
    xys = np.zeros((max(total2d, 1), 2), np.float64)
    p3d = np.zeros(max(total2d, 1), np.int64)
    r = lib.read_images_bin(path.encode(), n, total2d, CAP_NAME, _ptr(ids),
                            _ptr(qvecs), _ptr(tvecs), _ptr(cam_ids),
                            _ptr(names), _ptr(p2d_offs), _ptr(xys), _ptr(p3d))
    if r < 0:
        raise IOError(f"native image read failed: {path}")
    images = {}
    name_view = names.reshape(n, CAP_NAME)
    for i in range(n):
        raw = name_view[i].tobytes()
        name = raw[: raw.index(b"\x00")].decode("utf-8", "replace")
        s, e = p2d_offs[i], p2d_offs[i + 1]
        images[int(ids[i])] = Image(
            int(ids[i]), qvecs[i].copy(), tvecs[i].copy(), int(cam_ids[i]),
            name, xys[s:e].copy(), p3d[s:e].copy(),
        )
    return images


def read_points3d_native(path: str) -> Dict[int, Point3D]:
    lib = _load()
    counts = np.zeros(2, np.int64)
    if lib.probe_points3d_bin(path.encode(), _ptr(counts)) != 0:
        raise IOError(f"native points3d probe failed: {path}")
    n, total_track = int(counts[0]), int(counts[1])
    ids = np.zeros(n, np.int64)
    xyzs = np.zeros((n, 3), np.float64)
    rgbs = np.zeros((n, 3), np.uint8)
    errors = np.zeros(n, np.float64)
    offs = np.zeros(n + 1, np.int64)
    tids = np.zeros(max(total_track, 1), np.int32)
    tidx = np.zeros(max(total_track, 1), np.int32)
    r = lib.read_points3d_bin(path.encode(), n, total_track, _ptr(ids),
                              _ptr(xyzs), _ptr(rgbs), _ptr(errors),
                              _ptr(offs), _ptr(tids), _ptr(tidx))
    if r < 0:
        raise IOError(f"native points3d read failed: {path}")
    pts = {}
    for i in range(n):
        s, e = offs[i], offs[i + 1]
        pts[int(ids[i])] = Point3D(int(ids[i]), xyzs[i].copy(), rgbs[i].copy(),
                                   float(errors[i]), tids[s:e].copy(),
                                   tidx[s:e].copy())
    return pts


def read_model_native(path: str):
    return (
        read_cameras_native(os.path.join(path, "cameras.bin")),
        read_images_native(os.path.join(path, "images.bin")),
        read_points3d_native(os.path.join(path, "points3D.bin")),
    )
