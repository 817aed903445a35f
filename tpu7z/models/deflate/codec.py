"""DEFLATE (RFC 1951) + gzip (RFC 1952) codec.

Behavioral reference: CPP/7zip/Compress/Deflate{Encoder,Decoder}.cpp
(which sit on LzFind); written from the RFCs. The encoder reuses the
shared vectorized match finder; literals/lengths go through dynamic
canonical Huffman built with package-merge (optimal within the 15-bit
format limit).
"""

from __future__ import annotations

import numpy as np

from ...utils.errors import CorruptError
from ..lz4 import block as lz4block
from ..zstd.huffman import _package_merge

LENGTH_BASE = np.array(
    [3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43, 51,
     59, 67, 83, 99, 115, 131, 163, 195, 227, 258], dtype=np.int64)
LENGTH_EXTRA = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4,
     4, 5, 5, 5, 5, 0], dtype=np.int64)
DIST_BASE = np.array(
    [1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193, 257, 385,
     513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193, 12289, 16385,
     24577], dtype=np.int64)
DIST_EXTRA = np.array(
    [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10,
     10, 11, 11, 12, 12, 13, 13], dtype=np.int64)
CLC_ORDER = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1,
             15]

# Deflate64 ("enhanced deflate", PKWARE appnote 5.2; reference
# CPP/7zip/Compress/Deflate64 register + DeflateDecoder.cpp _deflate64Mode):
# symbol 285 switches from literal-258 to base 3 + 16 extra bits, and two
# extra distance codes extend the window to 64 KiB.
LENGTH_BASE64 = LENGTH_BASE.copy()
LENGTH_EXTRA64 = LENGTH_EXTRA.copy()
LENGTH_BASE64[28] = 3
LENGTH_EXTRA64[28] = 16
DIST_BASE64 = np.concatenate([DIST_BASE, [32769, 49153]])
DIST_EXTRA64 = np.concatenate([DIST_EXTRA, [14, 14]])


class _LSBReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise CorruptError("deflate: bitstream exhausted")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v

    def align(self):
        self.pos = (self.pos + 7) & ~7


class _LSBWriter:
    __slots__ = ("acc", "n", "out")

    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def write(self, value: int, bits: int):
        self.acc |= (value & ((1 << bits) - 1)) << self.n
        self.n += bits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def align(self):
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0

    def close(self) -> bytes:
        self.align()
        return bytes(self.out)


def _rev_bits(v: int, n: int) -> int:
    r = 0
    for _ in range(n):
        r = (r << 1) | (v & 1)
        v >>= 1
    return r


def _canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """RFC 1951 canonical codes (MSB-order values; write bit-reversed)."""
    max_len = int(lengths.max()) if lengths.size else 0
    bl_count = np.bincount(lengths, minlength=max_len + 1)
    bl_count[0] = 0
    codes = np.zeros(lengths.size, dtype=np.int64)
    code = 0
    next_code = np.zeros(max_len + 2, dtype=np.int64)
    for bits in range(1, max_len + 1):
        code = (code + int(bl_count[bits - 1])) << 1
        next_code[bits] = code
    for s in range(lengths.size):
        ln = int(lengths[s])
        if ln:
            codes[s] = next_code[ln]
            next_code[ln] += 1
    return codes


class _HuffDec:
    """Canonical decoder over (length, symbol) pairs, LSB-first stream."""

    def __init__(self, lengths: np.ndarray):
        self.max_len = int(lengths.max())
        codes = _canonical_codes(lengths)
        self.by_len = {}
        for s in range(lengths.size):
            ln = int(lengths[s])
            if ln:
                self.by_len.setdefault(ln, {})[int(codes[s])] = s

    def decode(self, r: _LSBReader) -> int:
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | r.read(1)
            d = self.by_len.get(ln)
            if d is not None and code in d:
                return d[code]
        raise CorruptError("deflate: invalid huffman code")


_FIXED_LIT_LEN = np.array([8] * 144 + [9] * 112 + [7] * 24 + [8] * 8,
                          dtype=np.int64)
_FIXED_DIST_LEN = np.full(30, 5, dtype=np.int64)


def decompress(src: bytes, max_out: int | None = None,
               deflate64: bool = False, history: bytes = b"") -> bytes:
    """`history` primes the LZ77 window (raw deflate continuation, e.g.
    CAB MSZIP blocks whose window persists across CFDATA records); the
    returned bytes exclude it. `max_out` counts history + new output
    when history is given (callers pass the sum)."""
    if deflate64:
        len_base, len_extra = LENGTH_BASE64, LENGTH_EXTRA64
        dist_base, dist_extra = DIST_BASE64, DIST_EXTRA64
        ndist = 32
    else:
        len_base, len_extra = LENGTH_BASE, LENGTH_EXTRA
        dist_base, dist_extra = DIST_BASE, DIST_EXTRA
        ndist = 30
    r = _LSBReader(src)
    out = bytearray(history)
    while True:
        bfinal = r.read(1)
        btype = r.read(2)
        if btype == 0:
            r.align()
            byte = r.pos >> 3
            if byte + 4 > len(src):
                raise CorruptError("deflate: truncated stored header")
            ln = src[byte] | (src[byte + 1] << 8)
            nln = src[byte + 2] | (src[byte + 3] << 8)
            if ln != (~nln & 0xFFFF):
                raise CorruptError("deflate: stored length mismatch")
            r.pos += 32
            byte += 4
            if byte + ln > len(src):
                raise CorruptError("deflate: truncated stored block")
            out += src[byte:byte + ln]
            r.pos += 8 * ln
        elif btype in (1, 2):
            if btype == 1:
                lit_dec = _HuffDec(_FIXED_LIT_LEN)
                dist_dec = _HuffDec(np.full(ndist, 5, dtype=np.int64)
                                    if deflate64 else _FIXED_DIST_LEN)
            else:
                hlit = r.read(5) + 257
                hdist = r.read(5) + 1
                hclen = r.read(4) + 4
                clc_len = np.zeros(19, dtype=np.int64)
                for i in range(hclen):
                    clc_len[CLC_ORDER[i]] = r.read(3)
                clc = _HuffDec(clc_len)
                all_len = np.zeros(hlit + hdist, dtype=np.int64)
                i = 0
                while i < hlit + hdist:
                    s = clc.decode(r)
                    if s < 16:
                        all_len[i] = s
                        i += 1
                    elif s == 16:
                        if i == 0:
                            raise CorruptError("deflate: repeat at start")
                        rep = 3 + r.read(2)
                        all_len[i:i + rep] = all_len[i - 1]
                        i += rep
                    elif s == 17:
                        i += 3 + r.read(3)
                    else:
                        i += 11 + r.read(7)
                if i != hlit + hdist:
                    raise CorruptError("deflate: code length overflow")
                lit_dec = _HuffDec(all_len[:hlit])
                dist_dec = _HuffDec(all_len[hlit:])
            while True:
                sym = lit_dec.decode(r)
                if sym < 256:
                    out.append(sym)
                elif sym == 256:
                    break
                else:
                    li = sym - 257
                    if li >= 29:
                        raise CorruptError("deflate: bad length symbol")
                    length = int(len_base[li]) + r.read(int(len_extra[li]))
                    ds = dist_dec.decode(r)
                    if ds >= ndist:
                        raise CorruptError("deflate: bad distance symbol")
                    dist = int(dist_base[ds]) + r.read(int(dist_extra[ds]))
                    if dist > len(out):
                        raise CorruptError("deflate: distance too far")
                    for _ in range(length):
                        out.append(out[-dist])
        else:
            raise CorruptError("deflate: reserved block type")
        if max_out is not None and len(out) > max_out:
            raise CorruptError("deflate: output limit exceeded")
        if bfinal:
            break
    return bytes(out[len(history):])


def _len_code(length: np.ndarray) -> np.ndarray:
    return np.searchsorted(LENGTH_BASE, length, side="right") - 1


def _dist_code(dist: np.ndarray) -> np.ndarray:
    return np.searchsorted(DIST_BASE, dist, side="right") - 1


def compress(data: bytes, level: int = 6, block_size: int = 1 << 17) -> bytes:
    """Dynamic-Huffman DEFLATE with the shared vectorized matcher."""
    w = _LSBWriter()
    n = len(data)
    if n == 0:
        w.write(1, 1)
        w.write(1, 2)  # fixed block, just EOB
        codes = _canonical_codes(_FIXED_LIT_LEN)
        w.write(_rev_bits(int(codes[256]), 7), 7)
        return w.close()
    for start in range(0, n, block_size):
        chunk = data[start:start + block_size]
        final = 1 if start + block_size >= n else 0
        _compress_block(w, chunk, final)
    return w.close()


def _compress_block(w: _LSBWriter, chunk: bytes, final: int):
    s = np.frombuffer(chunk, dtype=np.uint8)
    n = s.size
    mpos, mlen, moff = _find_matches(s)
    # clamp lengths to 258
    mlen = np.minimum(mlen, 258)

    lit_mask = np.ones(n, dtype=bool)
    idx = _runs_idx(mpos, mlen)
    lit_mask[idx] = False
    lits = s[lit_mask]

    len_codes = _len_code(mlen) if mlen.size else np.empty(0, np.int64)
    dist_codes = _dist_code(moff) if moff.size else np.empty(0, np.int64)

    lit_hist = np.bincount(lits, minlength=286).astype(np.int64)
    lit_hist[256] = 1
    np.add.at(lit_hist, 257 + len_codes, 1)
    dist_hist = np.bincount(dist_codes, minlength=30).astype(np.int64)

    lit_lens = _lens_from_hist(lit_hist, 286, 15)
    if dist_hist.sum() == 0:
        dist_lens = np.zeros(30, dtype=np.int64)
        dist_lens[0] = 1
    else:
        dist_lens = _lens_from_hist(np.maximum(dist_hist, 0), 30, 15)
    lit_codes = _canonical_codes(lit_lens)
    dist_codes_tbl = _canonical_codes(dist_lens)

    w.write(final, 1)
    w.write(2, 2)
    _write_dynamic_header(w, lit_lens, dist_lens)

    # serialize: walk literals and matches in order
    li = 0
    mi = 0
    pos = 0
    while pos < n:
        if mi < mpos.size and mpos[mi] == pos:
            lc = int(len_codes[mi])
            sym = 257 + lc
            w.write(_rev_bits(int(lit_codes[sym]), int(lit_lens[sym])),
                    int(lit_lens[sym]))
            eb = int(LENGTH_EXTRA[lc])
            if eb:
                w.write(int(mlen[mi] - LENGTH_BASE[lc]), eb)
            dc = int(dist_codes[mi])
            w.write(_rev_bits(int(dist_codes_tbl[dc]), int(dist_lens[dc])),
                    int(dist_lens[dc]))
            eb = int(DIST_EXTRA[dc])
            if eb:
                w.write(int(moff[mi] - DIST_BASE[dc]), eb)
            pos += int(mlen[mi])
            mi += 1
        else:
            b = int(s[pos])
            w.write(_rev_bits(int(lit_codes[b]), int(lit_lens[b])),
                    int(lit_lens[b]))
            pos += 1
    w.write(_rev_bits(int(lit_codes[256]), int(lit_lens[256])),
            int(lit_lens[256]))


def _lens_from_hist(hist: np.ndarray, size: int, max_bits: int) -> np.ndarray:
    nz = np.nonzero(hist)[0]
    lens = np.zeros(size, dtype=np.int64)
    if nz.size == 1:
        lens[nz[0]] = 1
        return lens
    lens[nz] = _package_merge(hist[nz], max_bits)
    return lens


def _write_dynamic_header(w, lit_lens, dist_lens):
    hlit = 286
    hdist = 30
    all_len = np.concatenate([lit_lens, dist_lens])
    # RLE of code lengths with 16/17/18
    ops = []
    i = 0
    N = all_len.size
    while i < N:
        v = int(all_len[i])
        j = i
        while j < N and all_len[j] == v:
            j += 1
        run = j - i
        if v == 0:
            while run >= 11:
                r = min(run, 138)
                ops.append((18, r - 11, 7))
                run -= r
            while run >= 3:
                r = min(run, 10)
                ops.append((17, r - 3, 3))
                run -= r
            ops.extend([(0, None, None)] * run)
        else:
            ops.append((v, None, None))
            run -= 1
            while run >= 3:
                r = min(run, 6)
                ops.append((16, r - 3, 2))
                run -= r
            ops.extend([(v, None, None)] * run)
        i = j
    clc_hist = np.zeros(19, dtype=np.int64)
    for sym, _arg, _bits in ops:
        clc_hist[sym] += 1
    clc_lens = _lens_from_hist(clc_hist, 19, 7)
    clc_codes = _canonical_codes(clc_lens)
    # hclen: trim trailing zeros in CLC order
    order_lens = [int(clc_lens[CLC_ORDER[i]]) for i in range(19)]
    hclen = 19
    while hclen > 4 and order_lens[hclen - 1] == 0:
        hclen -= 1
    w.write(hlit - 257, 5)
    w.write(hdist - 1, 5)
    w.write(hclen - 4, 4)
    for i in range(hclen):
        w.write(order_lens[i], 3)
    for sym, arg, bits in ops:
        w.write(_rev_bits(int(clc_codes[sym]), int(clc_lens[sym])),
                int(clc_lens[sym]))
        if arg is not None:
            w.write(arg, bits)


def _find_matches(s: np.ndarray):
    n = s.size
    if n < 16:
        return (np.empty(0, np.int64),) * 3
    cand = lz4block._find_candidates(s, hashlog=15)
    pos_all = np.arange(cand.size, dtype=np.int64)
    off = pos_all - cand
    valid = (cand >= 0) & (off <= 32768) & (pos_all <= n - 4)
    limit = np.zeros(cand.size, dtype=np.int64)
    limit[valid] = np.minimum(n - pos_all[valid], 258)
    mlen = np.zeros(cand.size, dtype=np.int64)
    vidx = np.where(valid)[0]
    if vidx.size:
        mlen[vidx] = lz4block._match_lengths(s, pos_all[vidx], cand[vidx],
                                             limit[vidx])
    valid &= mlen >= 3
    nxt = np.where(valid, pos_all + mlen, pos_all + 1)
    full_next = np.full(n, n, dtype=np.int64)
    full_next[: nxt.size] = nxt
    visited = lz4block._greedy_parse(full_next, n)
    is_match = np.zeros(n, dtype=bool)
    vm = np.zeros(n, dtype=np.int64)
    vo = np.zeros(n, dtype=np.int64)
    is_match[: valid.size] = valid
    vm[: mlen.size] = mlen
    vo[: off.size] = off
    m_sel = visited[is_match[visited]]
    return m_sel, vm[m_sel], vo[m_sel]


def _runs_idx(starts, lengths):
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    base = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    within = np.arange(total) - np.repeat(base, lengths)
    return np.repeat(starts, lengths) + within


# ---------------------------------------------------------------------------
# gzip / zlib wrappers
# ---------------------------------------------------------------------------

def gzip_compress(data: bytes, level: int = 6) -> bytes:
    from ...ops.hashing import crc32_fast
    hdr = bytes([0x1F, 0x8B, 8, 0, 0, 0, 0, 0, 0, 255])
    body = compress(data, level)
    tail = (crc32_fast(data).to_bytes(4, "little")
            + (len(data) & 0xFFFFFFFF).to_bytes(4, "little"))
    return hdr + body + tail


def gzip_decompress(src: bytes) -> bytes:
    from ...ops.hashing import crc32_fast
    if len(src) < 18 or src[0] != 0x1F or src[1] != 0x8B or src[2] != 8:
        raise CorruptError("gzip: bad header")
    flg = src[3]
    pos = 10
    if flg & 4:  # FEXTRA
        xlen = src[pos] | (src[pos + 1] << 8)
        pos += 2 + xlen
    if flg & 8:  # FNAME
        pos = src.index(b"\x00", pos) + 1
    if flg & 16:  # FCOMMENT
        pos = src.index(b"\x00", pos) + 1
    if flg & 2:  # FHCRC
        pos += 2
    data = decompress(src[pos:-8])
    want_crc = int.from_bytes(src[-8:-4], "little")
    want_len = int.from_bytes(src[-4:], "little")
    if len(data) & 0xFFFFFFFF != want_len:
        raise CorruptError("gzip: length mismatch")
    if crc32_fast(data) != want_crc:
        raise CorruptError("gzip: crc mismatch")
    return data
