"""ctypes binding for the native host-pipeline core (dvie_host.cpp).

The shared library is built lazily with the system toolchain (g++ +
libpng) the first time it is needed and cached next to the source; a
stale cache (source newer than the .so) triggers a rebuild.  Every entry
point degrades gracefully: if the toolchain or libpng is missing, the
build fails, or a file is in a format the native decoder does not
handle, callers get ``None`` and fall back to the PIL/numpy path —
the native layer is a pure accelerator, never a requirement.

Kill switch: ``DVIE_NATIVE_LOADER=0`` disables the native path entirely
(read per call so tests can flip it).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "dvie_host.cpp")
_SO = os.path.join(_DIR, "_build", "libdvie_host.so")

_lock = threading.Lock()
_lib = None          # ctypes.CDLL once loaded
_failed = False      # build/load failed: stop retrying


def enabled() -> bool:
    return os.environ.get("DVIE_NATIVE_LOADER", "1") != "0"


def _build_so() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    tmp = _SO + f".tmp.{os.getpid()}"
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        "-o", tmp, _SRC, "-lpng", "-lz",
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if res.returncode != 0:
            return False
        os.replace(tmp, _SO)  # atomic: concurrent builders race benignly
        return True
    except Exception:
        return False
    finally:
        try:  # drop any partial artifact from a failed/timed-out compile
            os.unlink(tmp)
        except OSError:
            pass


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None:
        return _lib
    if _failed:
        return None
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            stale = (not os.path.exists(_SO)
                     or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
            if stale and not _build_so():
                _failed = True
                return None
            lib = ctypes.CDLL(_SO)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            i32 = ctypes.c_int32
            i32p = ctypes.POINTER(ctypes.c_int32)
            f32p = ctypes.POINTER(ctypes.c_float)
            lib.dvie_png_info.argtypes = [
                u8p, ctypes.c_size_t, i32p, i32p, i32p, i32p, i32p]
            lib.dvie_png_info.restype = ctypes.c_int
            lib.dvie_decode_rgb_norm.argtypes = [
                u8p, ctypes.c_size_t, f32p, i32, i32, i32, i32, i32, i32]
            lib.dvie_decode_rgb_norm.restype = ctypes.c_int
            lib.dvie_decode_seg_onehot.argtypes = [
                u8p, ctypes.c_size_t, f32p, i32, i32, i32, i32, i32, i32]
            lib.dvie_decode_seg_onehot.restype = ctypes.c_int
            lib.dvie_decode_u8.argtypes = [u8p, ctypes.c_size_t, u8p, i32]
            lib.dvie_decode_u8.restype = ctypes.c_int
            lib.dvie_encode_png.argtypes = [
                u8p, i32, i32, i32, i32, u8p, ctypes.c_int64]
            lib.dvie_encode_png.restype = ctypes.c_int64
            lib.dvie_host_abi_version.restype = ctypes.c_int
            if lib.dvie_host_abi_version() != 1:
                _failed = True
                return None
            _lib = lib
        except Exception:
            _failed = True
            return None
        return _lib


def available() -> bool:
    """True iff the native library is (buildable and) loaded and enabled."""
    return enabled() and _load() is not None


def _as_u8p(buf: bytes):
    return ctypes.cast(ctypes.c_char_p(buf), ctypes.POINTER(ctypes.c_uint8))


def png_info(buf: bytes) -> Optional[Tuple[int, int, int, int, int]]:
    """(h, w, color_type, bit_depth, interlace) or None."""
    if not enabled():
        return None
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    ct = ctypes.c_int32()
    bd = ctypes.c_int32()
    il = ctypes.c_int32()
    rc = lib.dvie_png_info(_as_u8p(buf), len(buf), ctypes.byref(h),
                           ctypes.byref(w), ctypes.byref(ct),
                           ctypes.byref(bd), ctypes.byref(il))
    if rc != 0:
        return None
    return h.value, w.value, ct.value, bd.value, il.value


def native_decodable(buf: bytes, channels: int) -> Optional[Tuple[int, int]]:
    """(h, w) if the fused native decoders handle this file, else None."""
    info = png_info(buf)
    if info is None:
        return None
    h, w, ct, bd, il = info
    want_ct = 2 if channels == 3 else 0  # PNG_COLOR_TYPE_RGB / _GRAY
    if ct != want_ct or bd != 8 or il != 0:
        return None
    if h * w > 64 * 1024 * 1024:  # decoders' kMaxPixels (dvie_host.cpp)
        return None
    return h, w


def decode_rgb_norm(buf: bytes, y0: int, x0: int, ch: int, cw: int,
                    flip: bool, mode: int = 0) -> Optional[np.ndarray]:
    """Fused decode+flip+crop+normalize -> float32 (ch, cw, 3), or None."""
    if not enabled():
        return None
    lib = _load()
    if lib is None:
        return None
    out = np.empty((ch, cw, 3), np.float32)
    rc = lib.dvie_decode_rgb_norm(
        _as_u8p(buf), len(buf),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        y0, x0, ch, cw, 1 if flip else 0, mode)
    return out if rc == 0 else None


def decode_seg_onehot(buf: bytes, y0: int, x0: int, ch: int, cw: int,
                      flip: bool, n_classes: int) -> Optional[np.ndarray]:
    """Fused decode+flip+crop+one-hot -> float32 (ch, cw, n), or None.

    A seg id >= n_classes returns None (the PIL fallback's np.eye gather
    then raises IndexError, preserving the loud-failure contract).
    """
    if not enabled():
        return None
    lib = _load()
    if lib is None:
        return None
    out = np.empty((ch, cw, n_classes), np.float32)
    rc = lib.dvie_decode_seg_onehot(
        _as_u8p(buf), len(buf),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        y0, x0, ch, cw, 1 if flip else 0, n_classes)
    return out if rc == 0 else None


def encode_png(arr: np.ndarray, level: int = 1) -> Optional[bytes]:
    """Encode uint8 (h, w) gray or (h, w, 3) RGB to PNG bytes, or None.

    ``level`` is the zlib effort; 1 (Z_BEST_SPEED) is the product
    default — PNG is lossless at every level, only the stream differs.
    """
    if not enabled():
        return None
    lib = _load()
    if lib is None:
        return None
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        return None
    channels = 1 if arr.ndim == 2 else arr.shape[2]
    if channels not in (1, 3):
        return None
    arr = np.ascontiguousarray(arr)
    h, w = arr.shape[:2]
    raw = h * w * channels
    out = np.empty(raw + raw // 64 + 4096, np.uint8)
    n = lib.dvie_encode_png(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, channels,
        level, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.nbytes)
    if n <= 0:
        return None
    return out[:n].tobytes()


def save_png(path: str, arr: np.ndarray, level: int = 1) -> None:
    """Write uint8 gray/RGB as PNG: native fast encoder, PIL fallback."""
    data = encode_png(arr, level)
    if data is not None:
        with open(path, "wb") as f:
            f.write(data)
        return
    from PIL import Image
    Image.fromarray(arr).save(path)


def decode_u8(buf: bytes, channels: int) -> Optional[np.ndarray]:
    """Raw 8-bit decode -> uint8 (h, w[, 3]), or None."""
    if not enabled():
        return None
    lib = _load()
    if lib is None:
        return None
    dims = native_decodable(buf, channels)
    if dims is None:
        return None
    h, w = dims
    shape = (h, w, 3) if channels == 3 else (h, w)
    out = np.empty(shape, np.uint8)
    rc = lib.dvie_decode_u8(
        _as_u8p(buf), len(buf),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), channels)
    return out if rc == 0 else None
