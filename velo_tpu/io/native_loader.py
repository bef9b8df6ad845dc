"""ctypes bridge to the native async scan loader (SURVEY.md C1).

Builds ``velo_tpu/native/libveloio.so`` on first use (g++, no external deps)
and exposes an iterator of pre-padded (scan, mask) numpy frame pairs that are
read ahead by a C++ thread pool.  Falls back to the pure-Python loader when a
compiler is unavailable, so the package never hard-requires the native path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libveloio.so"))

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "veloio.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-pthread", "-shared",
             "-o", _SO_PATH, src],
            check=True, capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.velo_loader_open.restype = ctypes.c_void_p
    lib.velo_loader_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_int]
    lib.velo_loader_count.restype = ctypes.c_int
    lib.velo_loader_count.argtypes = [ctypes.c_void_p]
    lib.velo_loader_next.restype = ctypes.c_int
    lib.velo_loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.velo_loader_close.argtypes = [ctypes.c_void_p]
    lib.velo_loader_open_binned.restype = ctypes.c_void_p
    lib.velo_loader_open_binned.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.velo_loader_next_binned.restype = ctypes.c_int
    lib.velo_loader_next_binned.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return lib


class NativeScanLoader:
    """Async prefetching iterator over a directory of velodyne .bin files."""

    def __init__(self, velo_dir: str, n_max: int, queue_depth: int = 4,
                 n_threads: int = 2):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native loader unavailable (no g++?)")
        self._lib = lib
        self._h = lib.velo_loader_open(
            velo_dir.encode(), n_max, queue_depth, n_threads
        )
        if not self._h:
            raise FileNotFoundError(f"no .bin scans under {velo_dir}")
        self.n_max = n_max
        self.n_frames = lib.velo_loader_count(self._h)

    def __len__(self) -> int:
        return self.n_frames

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        for _ in range(self.n_frames):
            pts = np.empty((self.n_max, 4), np.float32)
            mask = np.empty((self.n_max,), np.uint8)
            n = self._lib.velo_loader_next(
                self._h,
                pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
            if n == -2:
                return
            if n < 0:
                raise IOError("native loader: scan read failed")
            yield pts, mask.astype(bool)

    def close(self):
        if self._h:
            self._lib.velo_loader_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeBinnedScanLoader:
    """Async prefetch + in-worker pre-binning into (R, W, 5) grids.

    The C++ workers replicate ``rangeimage.bin_scan_host`` (bitwise-matching
    winner rule, unit-tested), so the device receives the range-image layout
    directly and never pays the scatter-min / winner-gather.
    """

    def __init__(self, velo_dir: str, lidar_cfg, n_max: int = 262144,
                 queue_depth: int = 4, n_threads: int = 4):
        from velo_tpu.lidar import rangeimage as ri_mod

        lib = load_library()
        if lib is None:
            raise RuntimeError("native loader unavailable (no g++?)")
        self._lib = lib
        R, W = lidar_cfg.n_rings, lidar_cfg.n_azimuth
        hdl = 1 if lidar_cfg.ring_mode == "hdl64e" else 0
        beams = np.ascontiguousarray(
            ri_mod.hdl64e_beam_elevations(R), dtype=np.float32)
        self._h = lib.velo_loader_open_binned(
            velo_dir.encode(), n_max, queue_depth, n_threads, R, W, hdl,
            float(lidar_cfg.az_start), float(lidar_cfg.min_range),
            float(lidar_cfg.max_range), float(lidar_cfg.elev_max_deg),
            float(lidar_cfg.elev_min_deg),
            beams.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if not self._h:
            raise FileNotFoundError(f"no .bin scans under {velo_dir}")
        self.shape = (R, W)
        self.n_frames = lib.velo_loader_count(self._h)

    def __len__(self) -> int:
        return self.n_frames

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        R, W = self.shape
        for _ in range(self.n_frames):
            grid = np.empty((R, W, 5), np.float32)
            valid = np.empty((R, W), np.uint8)
            n = self._lib.velo_loader_next_binned(
                self._h,
                grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
            if n == -2:
                return
            if n < 0:
                raise IOError("native loader: scan read failed")
            yield grid, valid.astype(bool)

    def close(self):
        if self._h:
            self._lib.velo_loader_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
