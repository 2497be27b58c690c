"""ctypes bindings for the native (C++) scan loader + prefetcher.

The compute path is JAX/XLA; the IO runtime around it is native
(`native/loader.cpp`): KITTI velodyne reading, NaN stripping, range crop, and
fixed-capacity staging happen in C++, with a background reader thread
double-buffering scan k+1 while the device processes scan k — the rosbag
producer/consumer pattern without ROS. Builds on demand with `make` (g++ is
in the image); falls back to the NumPy reader when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libxst_loader.so"))

_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if necessary) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.xst_read_velodyne.restype = ctypes.c_int64
    lib.xst_read_velodyne.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_float, ctypes.c_float,
    ]
    lib.xst_prefetcher_create.restype = ctypes.c_void_p
    lib.xst_prefetcher_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float,
    ]
    lib.xst_prefetcher_get.restype = ctypes.c_int64
    lib.xst_prefetcher_get.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.xst_prefetcher_destroy.restype = None
    lib.xst_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def read_velodyne(path: str, capacity: int, min_range: float = 0.0,
                  max_range: float = 0.0):
    """Native read → (xyz [capacity,3], intensity [capacity], n_valid)."""
    lib = get_lib()
    xyz = np.zeros((capacity, 3), np.float32)
    inten = np.zeros((capacity,), np.float32)
    if lib is None:
        from xchu_slam_tpu.io import kitti

        pts = kitti.read_velodyne_bin(path)
        if min_range > 0.0 or max_range > 0.0:
            r2 = pts[:, 0] ** 2 + pts[:, 1] ** 2
            lo = min_range ** 2
            hi = max_range ** 2 if max_range > 0 else np.inf
            pts = pts[(r2 > lo) & (r2 < hi)]
        n = min(len(pts), capacity)
        xyz[:n] = pts[:n, :3]
        inten[:n] = pts[:n, 3]
        return xyz, inten, n
    n = lib.xst_read_velodyne(
        path.encode(), xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        inten.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        capacity, min_range, max_range)
    if n < 0:
        raise FileNotFoundError(path)
    return xyz, inten, int(n)


class ScanPrefetcher:
    """Double-buffered background scan loader over a file list."""

    def __init__(self, files: list[str], capacity: int,
                 min_range: float = 0.0, max_range: float = 0.0):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self.lib = lib
        self.files = files
        self.capacity = capacity
        arr = (ctypes.c_char_p * len(files))(*[f.encode() for f in files])
        self._paths_keepalive = arr
        self.handle = lib.xst_prefetcher_create(
            arr, len(files), capacity, min_range, max_range)

    def get(self, idx: int):
        xyz = np.zeros((self.capacity, 3), np.float32)
        inten = np.zeros((self.capacity,), np.float32)
        n = self.lib.xst_prefetcher_get(
            self.handle, idx,
            xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            inten.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if n < 0:
            raise IndexError(idx)
        return xyz, inten, int(n)

    def close(self):
        if self.handle:
            self.lib.xst_prefetcher_destroy(self.handle)
            self.handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
