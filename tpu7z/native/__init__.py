"""Native host runtime bindings (ctypes over tpu7z_native.cpp).

The C++ library provides the host-side hot loops (hashers, LZ4 decode,
the LZMA range-decoder) — the CPU analog of the reference's C kernels.
If the shared library is missing we try one `make` (g++ is part of the
image toolchain); failing that, callers fall back to the numpy/Python
reference implementations transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "libtpu7z_native.so")

LIB = None


def _load():
    global LIB
    if LIB is not None:
        return LIB
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _HERE], capture_output=True,
                           timeout=120, check=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.tz_xxh32.restype = ctypes.c_uint32
    lib.tz_xxh32.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                             ctypes.c_uint32]
    lib.tz_xxh64.restype = ctypes.c_uint64
    lib.tz_xxh64.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                             ctypes.c_uint64]
    lib.tz_crc32.restype = ctypes.c_uint32
    lib.tz_crc32.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                             ctypes.c_uint32]
    lib.tz_crc64.restype = ctypes.c_uint64
    lib.tz_crc64.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                             ctypes.c_uint64]
    lib.tz_lz4_encode.restype = ctypes.c_longlong
    lib.tz_lz4_encode.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                  ctypes.c_void_p, ctypes.c_size_t]
    lib.tz_lz4_encode_region.restype = ctypes.c_longlong
    lib.tz_lz4_encode_region.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t,
        ctypes.c_void_p, ctypes.c_size_t]
    lib.tz_lz4_decode.restype = ctypes.c_longlong
    lib.tz_lz4_decode.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                  ctypes.c_void_p, ctypes.c_size_t]
    lib.tz_lzma_new.restype = ctypes.c_void_p
    lib.tz_lzma_new.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.tz_lzma_free.argtypes = [ctypes.c_void_p]
    lib.tz_lzma_reset_state.argtypes = [ctypes.c_void_p]
    lib.tz_lzma_reset_props.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_int]
    lib.tz_lzma_set_origin.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.tz_lzma_decode_chunk.restype = ctypes.c_longlong
    lib.tz_lzma_decode_chunk.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64]
    try:
        lib.tz_zstd_encode.restype = ctypes.c_longlong
        lib.tz_zstd_encode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_size_t, ctypes.c_int, ctypes.c_int]
    except AttributeError:
        pass  # stale .so without the zstd encoder; callers fall back
    try:
        lib.tz_zstd_encode_job.restype = ctypes.c_longlong
        lib.tz_zstd_encode_job.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_uint64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_size_t]
    except AttributeError:
        pass
    try:
        lib.tz_zstd_decode.restype = ctypes.c_longlong
        lib.tz_zstd_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_size_t, ctypes.c_int]
        lib.tz_zstd_decode_alloc.restype = ctypes.c_longlong
        lib.tz_zstd_decode_alloc.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int]
        lib.tz_buf_free.restype = None
        lib.tz_buf_free.argtypes = [ctypes.c_void_p]
        lib.tz_lzma2_encode.restype = ctypes.c_longlong
        lib.tz_lzma2_encode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_size_t, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_uint]
        lib.tz_lzma_raw_encode.restype = ctypes.c_longlong
        lib.tz_lzma_raw_encode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_size_t, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
    except AttributeError:
        pass  # stale .so without newer entry points; callers fall back
    LIB = lib
    return lib


def lzma2_encode(data: bytes, level: int = 9, lc: int = 3, lp: int = 0,
                 pb: int = 2, shard_size: int = 0):
    """Native LZMA2 stream encode (optimal parse); None if unavailable."""
    import ctypes
    lib = _load()
    if lib is None or not hasattr(lib, "tz_lzma2_encode"):
        return None
    cap = len(data) + (len(data) >> 2) + 4096
    buf = ctypes.create_string_buffer(cap)
    r = lib.tz_lzma2_encode(data, len(data), buf, cap, int(level),
                            lc, lp, pb, shard_size)
    if r <= 0:
        return None
    return buf.raw[:r]


def lzma_raw_encode(data: bytes, level: int = 9, lc: int = 3, lp: int = 0,
                    pb: int = 2):
    """Native raw LZMA1 encode -> (stream, props_byte); None if absent."""
    import ctypes
    lib = _load()
    if lib is None or not hasattr(lib, "tz_lzma_raw_encode"):
        return None
    cap = len(data) + (len(data) >> 2) + 4096
    buf = ctypes.create_string_buffer(cap)
    props = ctypes.c_uint8(0)
    r = lib.tz_lzma_raw_encode(data, len(data), buf, cap, int(level),
                               lc, lp, pb, ctypes.byref(props))
    if r < 0:
        return None
    return buf.raw[:r], props.value


def zstd_encode(data: bytes, level: int = 3, checksum: bool = True):
    """Native one-shot zstd frame compression; None if unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "tz_zstd_encode"):
        return None
    cap = len(data) + len(data) // 2 + 4096
    buf = ctypes.create_string_buffer(cap)
    r = lib.tz_zstd_encode(data, len(data), buf, cap, int(level),
                           1 if checksum else 0)
    if r <= 0:
        return None
    return buf.raw[:r]


def zstd_decode(data: bytes, verify_checksum: bool = True):
    """Native zstd decode of concatenated frames (the CPU tier of the
    flagship decode path, C/zstd/zstd_decompress_block.c analog).
    Returns bytes, or None if the library is unavailable or the frame
    needs an unsupported feature (external dictionary, legacy format)."""
    lib = _load()
    if lib is None or not hasattr(lib, "tz_zstd_decode_alloc"):
        return None
    out = ctypes.c_void_p()
    r = lib.tz_zstd_decode_alloc(data, len(data), ctypes.byref(out),
                                 1 if verify_checksum else 0)
    if r < 0:
        return None
    try:
        return ctypes.string_at(out, r)
    finally:
        lib.tz_buf_free(out)


def available() -> bool:
    return _load() is not None
