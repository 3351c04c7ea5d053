"""ctypes bindings for the native host library (csrc/si_host.cpp).

Native host-side runtime components, mirroring where the reference is
C++ (SURVEY.md §2): store-zip weight-archive parsing and letterbox image
preprocessing. Every entry point has a pure-Python fallback, so the
framework works without a toolchain; with g++ available the library is
built once on first use and cached next to the sources.

    from simpleinfer_tpu import host
    host.available()        -> bool (builds lazily)
    host.crc32(bytes)       -> int
    host.storezip_index(buf)-> {name: (offset, size)}
    host.letterbox_batch(imgs, size) -> [N,size,size,3] f32
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libsi_host.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_CSRC, "si_host.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-std=c++17",
             "-shared", "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
                os.path.exists(os.path.join(_CSRC, "si_host.cpp"))
                and os.path.getmtime(_LIB_PATH)
                < os.path.getmtime(os.path.join(_CSRC, "si_host.cpp"))):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        u64p = ctypes.POINTER(ctypes.c_uint64)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.si_crc32.restype = ctypes.c_uint32
        lib.si_crc32.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                 ctypes.c_uint32]
        lib.si_storezip_index.restype = ctypes.c_int64
        lib.si_storezip_index.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, u64p, u64p, u64p, u64p,
            ctypes.c_int64]
        lib.si_letterbox_u8.restype = None
        lib.si_letterbox_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_float, ctypes.c_int,
            ctypes.c_int]
        lib.si_letterbox_batch_u8.restype = None
        lib.si_letterbox_batch_u8.argtypes = [
            ctypes.c_void_p, i64p, i64p, i64p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_float, ctypes.c_int,
            ctypes.c_int]
        lib.si_nms.restype = ctypes.c_int64
        lib.si_nms.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_float, ctypes.c_int64, ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


# ------------------------------------------------------------------ crc32
def crc32(data: bytes, seed: int = 0) -> int:
    lib = _load()
    if lib is None:
        import zlib

        return zlib.crc32(data, seed)
    return int(lib.si_crc32(data, len(data), seed))


# -------------------------------------------------------------- storezip
def storezip_index(buf: bytes) -> Optional[dict]:
    """{name: (data_offset, size)} from an in-memory store-zip, or None
    if the native library is unavailable / archive unsupported."""
    lib = _load()
    if lib is None:
        return None
    cap = 4096
    name_off = (ctypes.c_uint64 * cap)()
    name_len = (ctypes.c_uint64 * cap)()
    data_off = (ctypes.c_uint64 * cap)()
    data_size = (ctypes.c_uint64 * cap)()
    n = lib.si_storezip_index(buf, len(buf), name_off, name_len, data_off,
                              data_size, cap)
    if n < 0 or n > cap:
        # n > cap: the native walker counted more entries than it could
        # write — a partial index would silently lose weights; fall back
        # to the pure-Python walker instead
        return None
    out = {}
    for i in range(min(n, cap)):
        name = buf[name_off[i]:name_off[i] + name_len[i]].decode("utf-8")
        out[name] = (int(data_off[i]), int(data_size[i]))
    return out


# ------------------------------------------------------------- letterbox
def letterbox_one(img: np.ndarray, size: int = 640, pad_value: float = 114.0,
                  bgr_to_rgb: bool = True, normalize: bool = True
                  ) -> Optional[np.ndarray]:
    """Native letterbox of one HWC uint8 image; None -> use the numpy
    fallback (zoo.detect.letterbox)."""
    lib = _load()
    if lib is None or img.dtype != np.uint8 or img.ndim != 3 \
            or img.shape[2] != 3:
        return None
    img = np.ascontiguousarray(img)
    out = np.empty((size, size, 3), np.float32)
    lib.si_letterbox_u8(
        img.ctypes.data, img.shape[0], img.shape[1], out.ctypes.data,
        size, pad_value, int(bgr_to_rgb), int(normalize))
    return out


def letterbox_batch(imgs: list, size: int = 640, pad_value: float = 114.0,
                    bgr_to_rgb: bool = True, normalize: bool = True
                    ) -> Optional[np.ndarray]:
    """Native letterbox of a list of HWC uint8 images -> [N,size,size,3]."""
    lib = _load()
    if lib is None:
        return None
    if not imgs or any(im.dtype != np.uint8 or im.ndim != 3
                       or im.shape[2] != 3 for im in imgs):
        return None
    packed = np.concatenate([np.ascontiguousarray(im).reshape(-1)
                             for im in imgs])
    offsets, hs, ws = [], [], []
    off = 0
    for im in imgs:
        offsets.append(off)
        hs.append(im.shape[0])
        ws.append(im.shape[1])
        off += im.size
    n = len(imgs)
    out = np.empty((n, size, size, 3), np.float32)
    i64 = ctypes.c_int64 * n
    lib.si_letterbox_batch_u8(
        packed.ctypes.data, i64(*offsets), i64(*hs), i64(*ws), n,
        out.ctypes.data, size, pad_value, int(bgr_to_rgb), int(normalize))
    return out


def nms(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float = 0.45,
        max_keep: int = 300) -> Optional[np.ndarray]:
    """Native greedy NMS (csrc si_nms); None -> use the numpy fallback
    (zoo.detect.nms). Bit-identical keep set and order: stable sort by
    descending score, suppress IoU > thresh."""
    lib = _load()
    if lib is None:
        return None
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    if np.isnan(scores).any():
        # NaN breaks std::stable_sort's strict weak ordering (UB) and
        # would diverge from np.argsort anyway — use the numpy fallback
        return None
    n = boxes.shape[0]
    if boxes.shape != (n, 4) or scores.shape != (n,):
        raise ValueError(f"nms: bad shapes {boxes.shape} {scores.shape}")
    keep = np.empty(max(int(max_keep), 0), np.int64)
    kept = lib.si_nms(boxes.ctypes.data, scores.ctypes.data, n,
                      float(iou_thresh), int(max_keep), keep.ctypes.data)
    return keep[:kept].copy()
