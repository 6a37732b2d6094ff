"""Native host-runtime library (C++ via ctypes) for the asset/build
pipeline — the TPU-native equivalent of the reference's C++ host stack
(RTXMU builds, DirectXTex mip generation, fastgltf/DirectXMesh packing).

`lib()` compiles `hostops.cpp` with g++ on first use and caches the .so
next to the source; every wrapper returns None gracefully when the
toolchain or build is unavailable so callers keep their numpy fallback
(the device compute path is unaffected either way — XLA owns it)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "hostops.cpp")
_SO = os.path.join(_DIR, "libhostops.so")
_lib = None
_tried = False


def lib():
    """The loaded native library, or None if unbuildable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True, timeout=120)
        _lib = ctypes.CDLL(_SO)
        _lib.morton_order.argtypes = [ctypes.c_void_p] * 3 + [
            ctypes.c_int64, ctypes.c_void_p]
        _lib.block_bounds.argtypes = [ctypes.c_void_p] * 4 + [
            ctypes.c_int64, ctypes.c_int32] + [ctypes.c_void_p] * 2
        _lib.mip_downsample.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p]
        _lib.pack_level_quads.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p]
    except Exception:
        _lib = None
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def morton_order(v0: np.ndarray, v1: np.ndarray,
                 v2: np.ndarray) -> np.ndarray | None:
    """Stable Morton-code argsort of triangle centroids, or None."""
    L = lib()
    if L is None:
        return None
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    out = np.empty((v0.shape[0],), np.int32)
    L.morton_order(_ptr(v0), _ptr(v1), _ptr(v2), v0.shape[0], _ptr(out))
    return out


def block_bounds(sv0, sv1, sv2, sid, block: int):
    """(nb, 3) min/max AABBs over `block`-sized groups, or None."""
    L = lib()
    if L is None:
        return None
    sv0 = np.ascontiguousarray(sv0, np.float32)
    sv1 = np.ascontiguousarray(sv1, np.float32)
    sv2 = np.ascontiguousarray(sv2, np.float32)
    sid = np.ascontiguousarray(sid, np.int32)
    nb = sv0.shape[0] // block
    bmin = np.empty((nb, 3), np.float32)
    bmax = np.empty((nb, 3), np.float32)
    L.block_bounds(_ptr(sv0), _ptr(sv1), _ptr(sv2), _ptr(sid),
                   sv0.shape[0], block, _ptr(bmin), _ptr(bmax))
    # empty blocks keep the +/-3e38 sentinels -> match numpy's inf form
    bmin[bmin >= 3e38] = np.inf
    bmax[bmax <= -3e38] = -np.inf
    return bmin, bmax


def mip_downsample(src: np.ndarray) -> np.ndarray | None:
    """One box-filtered mip level of (H, W, C) f32, or None."""
    L = lib()
    if L is None:
        return None
    src = np.ascontiguousarray(src, np.float32)
    h, w, ch = src.shape
    nh, nw = max(h // 2, 1), max(w // 2, 1)
    dst = np.empty((nh, nw, ch), np.float32)
    L.mip_downsample(_ptr(src), h, w, ch, _ptr(dst))
    return dst


def pack_level_quads(level: np.ndarray, wrap_repeat: bool,
                     srgb: bool) -> np.ndarray | None:
    """(H*W, 4) u32 RGBA8 quad rows of a LINEAR (H, W, 4) level, or
    None."""
    L = lib()
    if L is None:
        return None
    level = np.ascontiguousarray(level, np.float32)
    h, w = level.shape[:2]
    out = np.empty((h * w, 4), np.uint32)
    L.pack_level_quads(_ptr(level), h, w, int(wrap_repeat), int(srgb),
                       _ptr(out))
    return out
