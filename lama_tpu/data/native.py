"""ctypes bindings for the native host-side data kernels (native/lama_io.cpp):
multithreaded JPEG decode and procedural mask rasterisation.

The library is built on demand (`make -C native`) and everything degrades
gracefully to the cv2/numpy path when the build is unavailable — `available()`
gates usage. This is the TPU build's counterpart of the reference's reliance
on torch's C++ DataLoader machinery (SURVEY §2.9 data-loading parallelism).
"""
import ctypes
import logging
import os
import subprocess
from typing import List, Optional

import numpy as np

LOGGER = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), 'native')
_LIB_PATH = os.path.join(_NATIVE_DIR, 'liblama_io.so')
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(['make', '-C', _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:
            LOGGER.info(f'native lama_io build unavailable ({e}); using cv2 path')
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        LOGGER.info(f'native lama_io load failed ({e}); using cv2 path')
        return None

    lib.lama_jpeg_dims.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                   ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int)]
    lib.lama_jpeg_dims.restype = ctypes.c_int
    lib.lama_jpeg_decode_rgb.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                         ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.lama_jpeg_decode_rgb.restype = ctypes.c_int
    lib.lama_jpeg_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int]
    lib.lama_jpeg_decode_batch.restype = ctypes.c_int
    lib.lama_draw_irregular.argtypes = [ctypes.c_void_p] + [ctypes.c_int] * 6 \
        + [ctypes.c_uint64]
    lib.lama_draw_rectangles.argtypes = [ctypes.c_void_p] + [ctypes.c_int] * 6 \
        + [ctypes.c_uint64]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_jpeg(data: bytes) -> Optional[np.ndarray]:
    """JPEG bytes -> HWC uint8 RGB, or None on failure."""
    lib = _load()
    if lib is None:
        return None
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.lama_jpeg_dims(data, len(data), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.lama_jpeg_decode_rgb(data, len(data),
                                  out.ctypes.data_as(ctypes.c_void_p),
                                  w.value, h.value)
    return out if rc == 0 else None


def decode_jpeg_batch(datas: List[bytes], n_threads: int = 4) -> List[Optional[np.ndarray]]:
    """Thread-pooled batch decode (the pool lives in C++, no GIL)."""
    lib = _load()
    if lib is None:
        return [None] * len(datas)
    n = len(datas)
    widths = (ctypes.c_int * n)()
    heights = (ctypes.c_int * n)()
    outs, out_ptrs = [], (ctypes.c_void_p * n)()
    data_ptrs = (ctypes.c_char_p * n)(*datas)
    lens = (ctypes.c_size_t * n)(*[len(d) for d in datas])
    ok = []
    for i, d in enumerate(datas):
        w, h = ctypes.c_int(), ctypes.c_int()
        if lib.lama_jpeg_dims(d, len(d), ctypes.byref(w), ctypes.byref(h)) == 0:
            arr = np.empty((h.value, w.value, 3), np.uint8)
            widths[i], heights[i] = w.value, h.value
            out_ptrs[i] = arr.ctypes.data_as(ctypes.c_void_p).value
            outs.append(arr)
            ok.append(True)
        else:
            dummy = np.empty((1, 1, 3), np.uint8)
            widths[i], heights[i] = 1, 1
            out_ptrs[i] = dummy.ctypes.data_as(ctypes.c_void_p).value
            outs.append(dummy)
            ok.append(False)
    lib.lama_jpeg_decode_batch(data_ptrs, lens, out_ptrs, widths, heights,
                               n, n_threads)
    return [o if k else None for o, k in zip(outs, ok)]


def draw_irregular_mask(shape, max_angle=4, max_len=60, max_width=20,
                        min_times=0, max_times=10, seed: int = 0) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    h, w = shape
    mask = np.zeros((h, w), np.float32)
    lib.lama_draw_irregular(mask.ctypes.data_as(ctypes.c_void_p), h, w,
                            int(max_angle), int(max_len), int(max_width),
                            int(min_times), int(max_times), int(seed) & (2**64 - 1))
    return mask[..., None]


def draw_rectangle_mask(shape, margin=10, bbox_min_size=30, bbox_max_size=100,
                        min_times=0, max_times=3, seed: int = 0) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    h, w = shape
    mask = np.zeros((h, w), np.float32)
    lib.lama_draw_rectangles(mask.ctypes.data_as(ctypes.c_void_p), h, w,
                             int(margin), int(bbox_min_size), int(bbox_max_size),
                             int(min_times), int(max_times), int(seed) & (2**64 - 1))
    return mask[..., None]
