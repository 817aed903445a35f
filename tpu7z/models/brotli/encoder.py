"""Brotli encoder (uncompressed meta-blocks + simple compressed path).

Round-1 encoder emits valid RFC 7932 streams using uncompressed
meta-blocks — decodable by any brotli implementation including the
reference (entropy-coded meta-blocks are the round-2 TPU path, sharing
the zstd Huffman machinery). compress_mt_container wraps frames in the
zstdmt "BR" skippable container the reference's 7z brotli coder emits
(C/zstdmt/brotli-mt_compress.c:301-321).
"""

from __future__ import annotations


class _Writer:
    __slots__ = ("acc", "n", "out")

    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def bits(self, value: int, n: int):
        self.acc |= (value & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def align(self):
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0

    def raw(self, data: bytes):
        self.align()
        self.out += data

    def close(self) -> bytes:
        self.align()
        return bytes(self.out)


def compress(data: bytes, quality: int = 0) -> bytes:
    w = _Writer()
    w.bits(0, 1)  # WBITS = 16
    n = len(data)
    pos = 0
    max_block = (1 << 24) - 1
    while pos < n:
        chunk = data[pos:pos + max_block]
        pos += len(chunk)
        w.bits(0, 1)   # ISLAST = 0
        mlen1 = len(chunk) - 1
        # MNIBBLES must be minimal (RFC 7932 9.2)
        if mlen1 < (1 << 16):
            w.bits(0, 2)
            w.bits(mlen1, 16)
        elif mlen1 < (1 << 20):
            w.bits(1, 2)
            w.bits(mlen1, 20)
        else:
            w.bits(2, 2)
            w.bits(mlen1, 24)
        w.bits(1, 1)   # ISUNCOMPRESSED
        w.raw(chunk)
    # final empty block
    w.bits(1, 1)  # ISLAST
    w.bits(1, 1)  # ISLASTEMPTY
    return w.close()


def compress_mt_container(data: bytes, quality: int = 0) -> bytes:
    stream = compress(data, quality)
    hdr = bytearray()
    hdr += (0x184D2A50).to_bytes(4, "little")
    hdr += (8).to_bytes(4, "little")
    hdr += len(stream).to_bytes(4, "little")
    hdr += b"BR"
    hint = min(0xFFFF, (len(data) >> 16) + (1 if len(data) & 0xFFFF else 0))
    hdr += hint.to_bytes(2, "little")
    return bytes(hdr) + stream
