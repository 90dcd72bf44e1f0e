"""Native (C++) decode kernels with build-on-first-use + ctypes.

The shared library is compiled from ``decode.cpp`` with g++ -O3 on
first import and cached next to the source; every decoder has a
numpy-vectorized fallback so the package works without a toolchain.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "decode.cpp")
_SO = os.path.join(_HERE, "_decode.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", _SO, _SRC,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return True
    except Exception as e:
        log.warning("native decode build failed: %s", e)
        return False


def get_lib():
    """The ctypes library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            log.warning("native decode load failed: %s", e)
            return None
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        c_u16p = ctypes.POINTER(ctypes.c_uint16)
        c_u32p = ctypes.POINTER(ctypes.c_uint32)
        c_i64 = ctypes.c_int64
        lib.decode_r1.argtypes = [c_u8p, c_u8p, c_i64, c_i64]
        lib.decode_r6.argtypes = [c_u8p, c_u8p, c_i64, c_i64]
        lib.decode_r12.argtypes = [c_u8p, c_u16p, c_i64, c_i64]
        lib.decode_r24.argtypes = [c_u8p, c_u32p, c_i64, c_i64]
        lib.byteswap16.argtypes = [c_u16p, c_u16p, c_i64]
        lib.byteswap32.argtypes = [c_u32p, c_u32p, c_i64]
        lib.decode_uint12_le.argtypes = [c_u8p, c_u16p, c_i64]
        _lib = lib
        return _lib


def _ptr(arr, typ):
    return arr.ctypes.data_as(ctypes.POINTER(typ))


# -- decoders (native fast path + numpy fallback) -----------------------


def _check_group(n_pix: int, group: int, fmt: str):
    if n_pix % group:
        # the bit-packed layouts order pixels in fixed groups; a
        # non-multiple frame is not decodable by either path (the
        # native loop would silently drop the tail, the numpy
        # fallback would raise an opaque reshape error)
        raise ValueError(
            f"{fmt}: n_pix={n_pix} must be a multiple of {group}"
        )


def decode_r1(raw: np.ndarray, n_pix: int) -> np.ndarray:
    """(n, n_pix//8) packed bytes -> (n, n_pix) u8."""
    _check_group(n_pix, 64, 'MIB r1')
    raw = np.ascontiguousarray(raw.reshape(raw.shape[0], -1))
    n = raw.shape[0]
    lib = get_lib()
    if lib is not None:
        out = np.empty((n, n_pix), dtype=np.uint8)
        lib.decode_r1(
            _ptr(raw, ctypes.c_uint8), _ptr(out, ctypes.c_uint8),
            n, n_pix,
        )
        return out
    stripes = raw.reshape(n, -1, 8)[:, :, ::-1]
    bits = np.unpackbits(stripes, axis=-1, bitorder="little")
    return bits.reshape(n, n_pix)


def decode_r6(raw: np.ndarray, n_pix: int) -> np.ndarray:
    """(n, n_pix) u8 -> (n, n_pix) u8, pixel order fixed."""
    _check_group(n_pix, 8, 'MIB r6')
    raw = np.ascontiguousarray(raw.reshape(raw.shape[0], -1))
    n = raw.shape[0]
    lib = get_lib()
    if lib is not None:
        out = np.empty((n, n_pix), dtype=np.uint8)
        lib.decode_r6(
            _ptr(raw, ctypes.c_uint8), _ptr(out, ctypes.c_uint8),
            n, n_pix,
        )
        return out
    return raw.reshape(n, -1, 8)[:, :, ::-1].reshape(n, n_pix)


def decode_r12(raw: np.ndarray, n_pix: int) -> np.ndarray:
    """(n, 2*n_pix) big-endian u16 bytes -> (n, n_pix) u16."""
    _check_group(n_pix, 4, 'MIB r12')
    raw = np.ascontiguousarray(
        raw.reshape(raw.shape[0], -1).view(np.uint8)
    )
    n = raw.shape[0]
    lib = get_lib()
    if lib is not None:
        out = np.empty((n, n_pix), dtype=np.uint16)
        lib.decode_r12(
            _ptr(raw, ctypes.c_uint8), _ptr(out, ctypes.c_uint16),
            n, n_pix,
        )
        return out
    vals = raw.view(">u2").astype(np.uint16).reshape(n, n_pix)
    return vals.reshape(n, -1, 4)[:, :, ::-1].reshape(n, n_pix)


def decode_r24(raw: np.ndarray, n_pix: int) -> np.ndarray:
    """(n, 4*n_pix) bytes (two r12 sub-frames, MSB first) ->
    (n, n_pix) u32."""
    _check_group(n_pix, 4, "MIB r24")
    raw = np.ascontiguousarray(
        raw.reshape(raw.shape[0], -1).view(np.uint8)
    )
    n = raw.shape[0]
    lib = get_lib()
    if lib is not None:
        out = np.empty((n, n_pix), dtype=np.uint32)
        lib.decode_r24(
            _ptr(raw, ctypes.c_uint8), _ptr(out, ctypes.c_uint32),
            n, n_pix,
        )
        return out
    halves = raw.reshape(n, 2, n_pix * 2)
    msb = decode_r12(halves[:, 0], n_pix).astype(np.uint32)
    lsb = decode_r12(halves[:, 1], n_pix).astype(np.uint32)
    return (msb << 12) | lsb


def decode_uint12_le(raw: np.ndarray) -> np.ndarray:
    """12-bit little-endian packed (3 bytes -> 2 pixels) -> u16
    (K2 IS format, reference k2is.py:83)."""
    raw = np.ascontiguousarray(raw.reshape(-1).view(np.uint8))
    n_pairs = raw.size // 3
    lib = get_lib()
    if lib is not None:
        out = np.empty(n_pairs * 2, dtype=np.uint16)
        lib.decode_uint12_le(
            _ptr(raw, ctypes.c_uint8), _ptr(out, ctypes.c_uint16),
            n_pairs,
        )
        return out
    triplets = raw[:n_pairs * 3].reshape(-1, 3).astype(np.uint16)
    out = np.empty(n_pairs * 2, dtype=np.uint16)
    out[0::2] = triplets[:, 0] | ((triplets[:, 1] & 0x0F) << 8)
    out[1::2] = ((triplets[:, 1] & 0xF0) >> 4) | (triplets[:, 2] << 4)
    return out


def byteswap(arr: np.ndarray) -> np.ndarray:
    """Return ``arr`` in NATIVE byte order (the TPU feed and jax
    require native-endian buffers; big-endian on-disk dtypes are the
    reference's Decoder byteswap case, io/dataset/base/decode.py:8).

    C++ fast path for 2/4-byte elements; numpy handles the rest.
    Native input is returned unchanged (no copy).
    """
    dt = arr.dtype
    if dt.isnative:
        return arr
    native = dt.newbyteorder("=")
    lib = get_lib()
    it = dt.itemsize
    if lib is not None and it in (2, 4) and arr.flags.c_contiguous:
        out = np.empty(arr.shape, dtype=native)
        if it == 2:
            lib.byteswap16(
                _ptr(arr, ctypes.c_uint16),
                _ptr(out, ctypes.c_uint16), arr.size,
            )
        else:
            lib.byteswap32(
                _ptr(arr, ctypes.c_uint32),
                _ptr(out, ctypes.c_uint32), arr.size,
            )
        return out
    return arr.astype(native)
