"""ctypes bindings for the native data-plane kernels (csrc/).

Builds lazily with g++ on first use (cached under csrc/build/); all users
fall back to the pure-numpy implementations when a toolchain is missing,
so the framework never hard-depends on the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "csrc", "synthetic_render.cpp")
_SRC_PNG = os.path.join(_ROOT, "csrc", "image_decode.cpp")
_SO = os.path.join(_ROOT, "csrc", "build", "libgta_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False
_has_png = False


def _build() -> bool:
    """Compile the native library; prefers renderer + libpng decode, falls
    back to renderer-only when libpng headers are absent."""
    global _has_png
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    base = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", "-o", _SO]
    for srcs, libs, png in (
        ([_SRC, _SRC_PNG], ["-lpng", "-lpthread"], True),
        ([_SRC], ["-lpthread"], False),
    ):
        try:
            subprocess.run(base + srcs + libs, check=True, capture_output=True, timeout=120)
            _has_png = png
            return True
        except Exception:
            continue
    return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _failed, _has_png
    with _lock:
        if _lib is not None or _failed:
            return _lib
        srcs_mtime = max(
            os.path.getmtime(p) for p in (_SRC, _SRC_PNG) if os.path.exists(p)
        )
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < srcs_mtime:
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.gta_render_views.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # cam_pos
                ctypes.POINTER(ctypes.c_float),  # extrinsics
                ctypes.POINTER(ctypes.c_float),  # centers
                ctypes.POINTER(ctypes.c_float),  # radii
                ctypes.POINTER(ctypes.c_float),  # colors
                ctypes.c_int,  # n_spheres
                ctypes.c_int,  # nv
                ctypes.c_int,  # h
                ctypes.c_int,  # w
                ctypes.c_float,  # focal
                ctypes.c_float,  # sensor_w
                ctypes.POINTER(ctypes.c_float),  # out images
                ctypes.POINTER(ctypes.c_float),  # out rays
            ]
            lib.gta_render_views.restype = None
            if _has_png or hasattr(lib, "gta_decode_pngs_rgb"):
                cp = ctypes.POINTER(ctypes.c_char_p)
                lib.gta_decode_pngs_rgb.argtypes = [
                    cp, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_float),
                ]
                lib.gta_decode_pngs_rgb.restype = ctypes.c_int
                lib.gta_decode_pngs_gray.argtypes = [
                    cp, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_ubyte),
                ]
                lib.gta_decode_pngs_gray.restype = ctypes.c_int
            _lib = lib
        except OSError:
            _failed = True
        return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def render_views(
    cam_pos: np.ndarray,  # [NV, 3]
    extrinsics: np.ndarray,  # [NV, 4, 4]
    centers: np.ndarray,  # [K, 3]
    radii: np.ndarray,  # [K]
    colors: np.ndarray,  # [K, 3]
    h: int,
    w: int,
    focal: float = 0.035,
    sensor_w: float = 0.032,
):
    """Native multi-view render. Returns (images [NV,h,w,3], rays [NV,h,w,3])
    or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    nv = cam_pos.shape[0]
    cam_pos = np.ascontiguousarray(cam_pos, np.float32)
    extrinsics = np.ascontiguousarray(extrinsics, np.float32)
    centers = np.ascontiguousarray(centers, np.float32)
    radii = np.ascontiguousarray(radii, np.float32)
    colors = np.ascontiguousarray(colors, np.float32)
    images = np.empty((nv, h, w, 3), np.float32)
    rays = np.empty((nv, h, w, 3), np.float32)
    lib.gta_render_views(
        _fptr(cam_pos), _fptr(extrinsics), _fptr(centers), _fptr(radii),
        _fptr(colors), len(radii), nv, h, w,
        ctypes.c_float(focal), ctypes.c_float(sensor_w),
        _fptr(images), _fptr(rays),
    )
    return images, rays


def _paths_arr(paths):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return ctypes.cast(arr, ctypes.POINTER(ctypes.c_char_p))


def decode_pngs_rgb(paths, h: int, w: int, threads: int = 0):
    """Decode PNGs in parallel to [n, h, w, 3] float32 RGB in [0, 1].

    Returns None when the native decoder is unavailable or any file fails
    (caller falls back to the Python path)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "gta_decode_pngs_rgb"):
        return None
    out = np.empty((len(paths), h, w, 3), np.float32)
    fails = lib.gta_decode_pngs_rgb(_paths_arr(paths), len(paths), h, w, threads, _fptr(out))
    return out if fails == 0 else None


def decode_pngs_gray(paths, h: int, w: int, threads: int = 0):
    """Decode single-channel PNGs (index masks) to [n, h, w] uint8, or None."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "gta_decode_pngs_gray"):
        return None
    out = np.empty((len(paths), h, w), np.uint8)
    fails = lib.gta_decode_pngs_gray(
        _paths_arr(paths), len(paths), h, w, threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out if fails == 0 else None
