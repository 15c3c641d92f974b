"""ctypes bindings for the native scene-I/O runtime (gsio.cpp).

Build lazily on first use (g++ -O3 -shared); data/colmap.py falls back to
the pure-Python parsers when no compiler is available. The .so is cached
next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "gsio.cpp")
_SO = os.path.join(_DIR, "libgsio.so")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None:
        return _LIB
    if _TRIED:
        return None
    _TRIED = True
    if not os.path.exists(_SO) or (os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        if not build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.gsio_read_points3d.restype = ctypes.c_longlong
    lib.gsio_read_points3d.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                       ctypes.c_void_p, ctypes.c_void_p]
    lib.gsio_read_images.restype = ctypes.c_longlong
    lib.gsio_read_images.argtypes = [ctypes.c_char_p] + [ctypes.c_void_p] * 6
    lib.gsio_read_cameras.restype = ctypes.c_longlong
    lib.gsio_read_cameras.argtypes = [ctypes.c_char_p] + [ctypes.c_void_p] * 5
    _LIB = lib
    return lib


def read_points3d(path: str):
    """Native points3D.bin parse → (xyz f64[n,3], rgb u8[n,3], err f64[n,1])
    or None if the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    n = lib.gsio_read_points3d(path.encode(), None, None, None)
    if n < 0:
        return None
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty((n, 1), np.float64)
    got = lib.gsio_read_points3d(path.encode(),
                                 xyz.ctypes.data_as(ctypes.c_void_p),
                                 rgb.ctypes.data_as(ctypes.c_void_p),
                                 err.ctypes.data_as(ctypes.c_void_p))
    if got != n:
        return None
    return xyz, rgb, err


def read_images(path: str):
    """Native images.bin parse → dict[int, (qvec, tvec, camera_id, name)]
    or None."""
    lib = load()
    if lib is None:
        return None
    name_total = ctypes.c_longlong(0)
    n = lib.gsio_read_images(path.encode(), None, None, None, None, None,
                             ctypes.byref(name_total))
    if n < 0:
        return None
    ids = np.empty(n, np.int32)
    qvec = np.empty((n, 4), np.float64)
    tvec = np.empty((n, 3), np.float64)
    cam_ids = np.empty(n, np.int32)
    names_buf = ctypes.create_string_buffer(int(name_total.value))
    got = lib.gsio_read_images(path.encode(),
                               ids.ctypes.data_as(ctypes.c_void_p),
                               qvec.ctypes.data_as(ctypes.c_void_p),
                               tvec.ctypes.data_as(ctypes.c_void_p),
                               cam_ids.ctypes.data_as(ctypes.c_void_p),
                               names_buf, None)
    if got != n:
        return None
    names = names_buf.raw.split(b"\x00")[:n]
    return {int(ids[i]): (qvec[i].copy(), tvec[i].copy(), int(cam_ids[i]),
                          names[i].decode("utf-8"))
            for i in range(n)}


def read_cameras(path: str):
    """Native cameras.bin parse → dict[int, (model_id, w, h, params)] or None."""
    lib = load()
    if lib is None:
        return None
    n = lib.gsio_read_cameras(path.encode(), None, None, None, None, None)
    if n < 0:
        return None
    ids = np.empty(n, np.int32)
    models = np.empty(n, np.int32)
    ws = np.empty(n, np.int64)
    hs = np.empty(n, np.int64)
    params = np.empty((n, 12), np.float64)
    got = lib.gsio_read_cameras(path.encode(),
                                ids.ctypes.data_as(ctypes.c_void_p),
                                models.ctypes.data_as(ctypes.c_void_p),
                                ws.ctypes.data_as(ctypes.c_void_p),
                                hs.ctypes.data_as(ctypes.c_void_p),
                                params.ctypes.data_as(ctypes.c_void_p))
    if got != n:
        return None
    n_params = {0: 3, 1: 4, 2: 4, 3: 5, 4: 8, 5: 8, 6: 12, 7: 5, 8: 4,
                9: 5, 10: 12}
    return {int(ids[i]): (int(models[i]), int(ws[i]), int(hs[i]),
                          params[i, :n_params[int(models[i])]].copy())
            for i in range(n)}
