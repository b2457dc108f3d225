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
            _maybe_build()
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
            lib.cspn_aug_pack.argtypes = [
                ctypes.c_void_p,  # rgb u8 [h0,w0,3] (strided)
                ctypes.c_long,  # rgb row stride (elements)
                ctypes.c_long,  # rgb col stride
                ctypes.c_long,  # rgb channel stride
                ctypes.c_void_p,  # depth f32 [h0,w0] (strided)
                ctypes.c_long,  # depth row stride (elements)
                ctypes.c_long,  # depth col stride
                ctypes.c_int,  # h0
                ctypes.c_int,  # w0
                ctypes.c_int,  # rh
                ctypes.c_int,  # rw
                ctypes.c_float,  # angle_deg
                ctypes.c_int,  # oh
                ctypes.c_int,  # ow
                ctypes.c_int,  # flip
                ctypes.c_void_p,  # jitter ops (int32[n])
                ctypes.c_void_p,  # jitter factors (f32[n])
                ctypes.c_int,  # n_jit
                ctypes.c_float,  # inv_scale
                ctypes.c_int,  # n_sample
                ctypes.c_int,  # denom_mode (0=total, 1=valid)
                ctypes.c_uint64,  # seed
                ctypes.c_void_p,  # out rgbd
                ctypes.c_void_p,  # out depth
            ]
            lib.cspn_aug_pack.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def _maybe_build() -> None:
    """Build libcspn_host.so when missing or older than its source.

    The mtime check keeps the common path make-free (no toolchain needed
    on hosts that ship a fresh .so, and spawn workers do not each shell
    out); an flock serializes the rebuild so concurrent processes racing
    a stale .so cannot interleave g++ writes with dlopen.  A failed build
    is non-fatal when a loadable .so already exists."""
    src = os.path.join(os.path.abspath(_NATIVE_DIR), "host_pipeline.cpp")
    try:
        fresh = os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src)
    except OSError:
        fresh = False
    if fresh:
        return
    import fcntl

    lock_path = os.path.join(os.path.abspath(_NATIVE_DIR), ".build_lock")
    with open(lock_path, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            # re-check under the lock: another process may have built it
            if os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src):
                return
        except OSError:
            pass
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            if not os.path.exists(_LIB_PATH):
                raise  # nothing to fall back to


def available() -> bool:
    return _load() is not None


def aug_available() -> bool:
    lib = _load()
    try:
        return lib is not None and lib.cspn_aug_pack is not None
    except AttributeError:
        return False


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


def aug_pack(
    rgb_u8: np.ndarray,
    depth: np.ndarray,
    *,
    resize_hw: tuple[int, int] | None,
    angle: float,
    crop_hw: tuple[int, int],
    flip: bool,
    jitter: list[tuple[int, float]],
    inv_scale: float,
    n_sample: int,
    sparse_denom: str,
    seed: int,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Fused PIL-equivalent augmentation + pack (native/host_pipeline.cpp
    cspn_aug_pack): resize + rotate(NEAREST) + center-crop + hflip +
    ColorJitter + normalize + depth/s + Bernoulli sparse + RGBD pack in
    one native pass.  `jitter` is [(op, factor)] in application order with
    op 0=brightness, 1=contrast, 2=saturation.

    Returns (rgbd [oh,ow,4] f32, depth [oh,ow] f32) or None if the native
    library is unavailable.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "cspn_aug_pack"):
        return None
    # strided views ride straight into C++ -- no contiguous copy for the
    # h5 planar CHW layout (pass rgb.transpose(1,2,0)) or box-crop slices
    if rgb_u8.dtype != np.uint8:
        rgb_u8 = rgb_u8.astype(np.uint8)
    if depth.dtype != np.float32:
        depth = depth.astype(np.float32)
    h0, w0 = depth.shape
    rh, rw = resize_hw if resize_hw is not None else (h0, w0)
    oh, ow = crop_hw
    ops = np.asarray([o for o, _ in jitter], dtype=np.int32)
    facs = np.asarray([f for _, f in jitter], dtype=np.float32)
    out_rgbd = np.empty((oh, ow, 4), np.float32)
    out_depth = np.empty((oh, ow), np.float32)
    r_rs, r_cs, r_chs = (s // rgb_u8.itemsize for s in rgb_u8.strides)
    d_rs, d_cs = (s // depth.itemsize for s in depth.strides)
    rc = lib.cspn_aug_pack(
        rgb_u8.ctypes.data,
        r_rs,
        r_cs,
        r_chs,
        depth.ctypes.data,
        d_rs,
        d_cs,
        h0,
        w0,
        rh,
        rw,
        ctypes.c_float(angle),
        oh,
        ow,
        int(bool(flip)),
        ops.ctypes.data if len(jitter) else None,
        facs.ctypes.data if len(jitter) else None,
        len(jitter),
        ctypes.c_float(inv_scale),
        int(n_sample),
        0 if sparse_denom == "total" else 1,
        ctypes.c_uint64(seed & (2**64 - 1)),
        out_rgbd.ctypes.data,
        out_depth.ctypes.data,
    )
    if rc != 0:
        return None
    return out_rgbd, out_depth


def count_valid(depth: np.ndarray, threshold: float = 1e-4) -> int | None:
    lib = _load()
    if lib is None:
        return None
    depth = np.ascontiguousarray(depth, dtype=np.float32)
    return int(lib.cspn_count_valid(depth.ctypes.data, depth.size, threshold))
