"""Native (C++) runtime components, exposed via ctypes.

The reference's performance-critical host code lives in third-party C++
(MinkowskiEngine quantisation, DataLoader workers — SURVEY.md §2.4); here the
equivalents are first-party: a threaded batched voxelizer.  Builds on demand
with g++ (cached .so next to the source); falls back to the numpy
implementation if no compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "voxelizer.cpp")
_LIB = os.path.join(_DIR, "libvoxelizer.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    # compile to a process-private temp path, then atomically rename:
    # concurrent builders (DataLoader workers, parallel pytest) must never
    # dlopen a partially written .so
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
        return True
    except Exception as e:  # compiler missing / failed: numpy fallback
        logging.getLogger("native").warning("voxelizer build failed: %s", e)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or (
        os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
    ):
        # a failed rebuild (no g++) falls through to load any existing
        # .so: a checked-out prebuilt library with an arbitrary mtime
        # beats the numpy fallback
        if not _build() and not os.path.exists(_LIB):
            return None
    try:
        lib = ctypes.CDLL(_LIB)
        lib.voxelize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
        ]
        lib.rotate_z_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ]
        _lib = lib
    except OSError as e:
        logging.getLogger("native").warning("voxelizer load failed: %s", e)
    return _lib


def voxelize_batch_native(points: np.ndarray, quant_size: float,
                          capacity: int, grid_radius: int = 64,
                          n_threads: int = 8):
    """[B, P, 3] float32 (NaN-padded) -> (coords [B,cap,3] i32,
    mask [B,cap] bool), or None if the native lib is unavailable."""
    if grid_radius > 512:
        # pack() offsets each coordinate by +512 into 10 bits
        # (voxelizer.cpp pack); larger radii would silently alias keys
        raise ValueError(f"grid_radius {grid_radius} > 512: exceeds the "
                         f"10-bit packed-key range of the native voxelizer")
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    b, p, _ = pts.shape
    coords = np.empty((b, capacity, 3), np.int32)
    mask = np.empty((b, capacity), np.uint8)
    lib.voxelize_batch(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(b), ctypes.c_int64(p), ctypes.c_float(quant_size),
        ctypes.c_int32(capacity), ctypes.c_int32(grid_radius),
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(n_threads),
    )
    return coords, mask.astype(bool)
