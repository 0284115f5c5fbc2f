"""ctypes bindings for the native data plane (native/vtx_data.cpp).

Auto-builds ``libvtx_data.so`` with g++ on first use (cached next to the
source); every call releases the GIL (pure-C entry points), so the host
loader's thread pool scales past Python's PIL path.  Falls back cleanly:
``available()`` is False when the toolchain or libjpeg is missing, and the
loaders keep using PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "vtx_data.cpp")
_OUT = os.path.join(os.path.dirname(_SRC), "libvtx_data.so")

BICUBIC = 0
BILINEAR = 1


def _build() -> Optional[str]:
    src = os.path.abspath(_SRC)
    out = os.path.abspath(_OUT)
    if not os.path.exists(src):
        return None
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", src,
           "-o", out, "-ljpeg"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except Exception:
        return None
    return out


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        try:
            _bind(lib, u8p)
        except AttributeError:
            # a stale cached .so missing newer symbols (mtime skew after a
            # copy-preserving deploy) must degrade to the PIL path, not crash
            return None
        _LIB = lib
        return _LIB


def _bind(lib: ctypes.CDLL, u8p) -> None:
    lib.vtx_jpeg_dims.argtypes = [u8p, ctypes.c_size_t,
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
    lib.vtx_jpeg_dims.restype = ctypes.c_int
    lib.vtx_decode_crop_resize.argtypes = [
        u8p, ctypes.c_size_t,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.vtx_decode_crop_resize.restype = ctypes.c_int
    lib.vtx_decode_crop_resize_fast.argtypes = \
        lib.vtx_decode_crop_resize.argtypes
    lib.vtx_decode_crop_resize_fast.restype = ctypes.c_int
    lib.vtx_decode_fbox_resize.argtypes = [
        u8p, ctypes.c_size_t,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.vtx_decode_fbox_resize.restype = ctypes.c_int
    lib.vtx_resize.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.vtx_resize.restype = ctypes.c_int


def available() -> bool:
    if os.environ.get("VTX_NATIVE_DATA", "1") in ("0", "false", "off"):
        return False
    return _load() is not None


def jpeg_dims(payload: bytes) -> Optional[Tuple[int, int]]:
    """(width, height) of a JPEG, or None if not decodable as JPEG."""
    lib = _load()
    if lib is None:
        return None
    buf = (ctypes.c_uint8 * len(payload)).from_buffer_copy(payload)
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.vtx_jpeg_dims(buf, len(payload), ctypes.byref(w), ctypes.byref(h)):
        return None
    return w.value, h.value


def decode_crop_resize(payload: bytes, box: Tuple[int, int, int, int],
                       out_size: Tuple[int, int], filter: int = BICUBIC,
                       fast: bool = False) -> Optional[np.ndarray]:
    """JPEG decode + crop(box=(x, y, w, h)) + Pillow-compatible resize.

    The decode is restricted to the crop region plus the resample kernel's
    support (libjpeg-turbo scanline cropping) — bit-identical to a full
    decode.  ``fast`` additionally enables DCT-domain scaled decode (the
    ``Image.draft()`` trick) when the crop is ≥2× the target: up to 64×
    fewer pixels through IDCT+resample, quality-neutral for augmentation but
    not bit-identical.

    Returns uint8 [out_h, out_w, 3] or None on failure (caller falls back
    to PIL)."""
    lib = _load()
    if lib is None:
        return None
    out_h, out_w = out_size
    out = np.empty((out_h, out_w, 3), np.uint8)
    buf = (ctypes.c_uint8 * len(payload)).from_buffer_copy(payload)
    x, y, w, h = box
    fn = lib.vtx_decode_crop_resize_fast if fast else lib.vtx_decode_crop_resize
    rc = fn(
        buf, len(payload), x, y, w, h,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_h, out_w, filter,
    )
    if rc != 0:
        return None
    return out


def decode_fbox_resize(payload: bytes, fbox: Tuple[float, float, float, float],
                       out_size: Tuple[int, int],
                       filter: int = BICUBIC) -> Optional[np.ndarray]:
    """JPEG decode + sub-pixel box (x0, y0, x1, y1) + Pillow resize.

    Bit-identical to resizing the WHOLE image and integer-cropping the
    window these source coordinates map to (the resample centers and filter
    scale coincide column-for-column) — fuses Resize(short)+CenterCrop into
    one region-restricted decode.  Returns None on failure."""
    lib = _load()
    if lib is None:
        return None
    out_h, out_w = out_size
    out = np.empty((out_h, out_w, 3), np.uint8)
    buf = (ctypes.c_uint8 * len(payload)).from_buffer_copy(payload)
    x0, y0, x1, y1 = fbox
    rc = lib.vtx_decode_fbox_resize(
        buf, len(payload), x0, y0, x1, y1,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_h, out_w, filter,
    )
    if rc != 0:
        return None
    return out


def resize(img: np.ndarray, box: Tuple[int, int, int, int],
           out_size: Tuple[int, int], filter: int = BICUBIC) -> Optional[np.ndarray]:
    """Pillow-compatible crop+resize of a raw uint8 [H,W,3] array."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    out_h, out_w = out_size
    out = np.empty((out_h, out_w, 3), np.uint8)
    x, y, w, h = box
    rc = lib.vtx_resize(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0], img.shape[1], x, y, w, h,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_h, out_w, filter,
    )
    if rc != 0:
        return None
    return out
