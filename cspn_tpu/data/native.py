"""ctypes binding for the native host-pipeline library (native/host_pipeline.cpp).

Auto-builds `libcspn_host.so` with make on first use; all callers fall back
to the numpy path when the toolchain or library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libcspn_host.so"))

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(
                    ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.cspn_pack_sample.argtypes = [
                ctypes.c_void_p,  # rgb u8
                ctypes.c_void_p,  # depth f32
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_float,
                ctypes.c_float,
                ctypes.c_uint64,
                ctypes.c_void_p,  # out rgbd
                ctypes.c_void_p,  # out depth
                ctypes.c_int,
            ]
            lib.cspn_count_valid.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_float,
            ]
            lib.cspn_count_valid.restype = ctypes.c_int64
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def pack_sample(
    rgb_u8: np.ndarray,
    depth: np.ndarray,
    inv_scale: float,
    p_sample: float,
    seed: int,
    num_threads: int = 4,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Fused normalize + depth-scale + sparse-sample + RGBD pack.

    rgb_u8: [H, W, 3] uint8 (contiguous); depth: [H, W] float32.
    Returns (rgbd [H, W, 4] f32, depth [H, W] f32) or None if unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    rgb_u8 = np.ascontiguousarray(rgb_u8, dtype=np.uint8)
    depth = np.ascontiguousarray(depth, dtype=np.float32)
    h, w = depth.shape
    out_rgbd = np.empty((h, w, 4), np.float32)
    out_depth = np.empty((h, w), np.float32)
    lib.cspn_pack_sample(
        rgb_u8.ctypes.data,
        depth.ctypes.data,
        h,
        w,
        ctypes.c_float(inv_scale),
        ctypes.c_float(p_sample),
        ctypes.c_uint64(seed & (2**64 - 1)),
        out_rgbd.ctypes.data,
        out_depth.ctypes.data,
        num_threads,
    )
    return out_rgbd, out_depth


def count_valid(depth: np.ndarray, threshold: float = 1e-4) -> int | None:
    lib = _load()
    if lib is None:
        return None
    depth = np.ascontiguousarray(depth, dtype=np.float32)
    return int(lib.cspn_count_valid(depth.ctypes.data, depth.size, threshold))
