"""Block-parallel decode driver — the MtDec analog.

The reference's MtDec pipeline (C/MtDec.c; users C/Lzma2DecMt.c:237,
C/XzDec.c:1427) runs a sequential speculative PARSE pass that finds
independent span boundaries without decoding payloads, hands spans to
worker threads, and reassembles the outputs in order.  Here the parse
pass is a cheap header walk per format, the workers are a thread pool
(every native decoder call drops the GIL inside ctypes), and ordered
assembly is an indexed join — the writeIndex ring as a list.

Independent-span sources:
  zstd:  whole frames (incl. skippable), found by walking block headers
         without decoding (Block_Header carries Block_Size; RFC 8878
         §3.1.1.2.2), exactly MtDec's parse-without-decode step;
  lz4:   blocks of a block-independent frame (each size-prefixed);
  lzma2: chunk groups separated by dictionary-reset control bytes
         (C/Lzma2Dec.c control-byte grammar).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

from ..utils.errors import CorruptError


def _default_workers(n: int | None) -> int:
    if n and n > 0:
        return n
    return min(8, os.cpu_count() or 1)


# --------------------------------------------------------------- zstd ---

_ZSTD_MAGIC = 0xFD2FB528
_SKIP_MIN, _SKIP_MAX = 0x184D2A50, 0x184D2A5F


def scan_zstd_frames(src: bytes) -> list[tuple[int, int]]:
    """Frame spans [(offset, size)] via header walk, no payload decode."""
    spans = []
    pos = 0
    n = len(src)
    while pos < n:
        if n - pos < 4:
            raise CorruptError("zstd: trailing garbage")
        magic = int.from_bytes(src[pos:pos + 4], "little")
        start = pos
        if _SKIP_MIN <= magic <= _SKIP_MAX:
            if n - pos < 8:
                raise CorruptError("zstd: truncated skippable frame")
            size = int.from_bytes(src[pos + 4:pos + 8], "little")
            pos += 8 + size
        elif magic == _ZSTD_MAGIC:
            pos += 4
            if pos >= n:
                raise CorruptError("zstd: truncated frame header")
            fhd = src[pos]
            pos += 1
            fcs_flag = fhd >> 6
            single = (fhd >> 5) & 1
            cksum = (fhd >> 2) & 1
            did = fhd & 3
            if not single:
                pos += 1  # window descriptor
            pos += (0, 1, 2, 4)[did]
            pos += (1 if single else 0, 2, 4, 8)[fcs_flag] \
                if (fcs_flag or single) else 0
            while True:
                if n - pos < 3:
                    raise CorruptError("zstd: truncated block header")
                bh = int.from_bytes(src[pos:pos + 3], "little")
                pos += 3
                last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
                if btype == 3:
                    raise CorruptError("zstd: reserved block type")
                pos += 1 if btype == 1 else bsize
                if last:
                    break
            if cksum:
                pos += 4
        else:
            raise CorruptError(f"zstd: bad magic {magic:#x}")
        if pos > n:
            raise CorruptError("zstd: frame overruns input")
        spans.append((start, pos - start))
    return spans


def decompress_zstd(src: bytes, threads: int | None = None,
                    verify_checksum: bool = True) -> bytes:
    """Frame-parallel zstd decode; bytes identical to the serial path."""
    from ..models.zstd import frame as zf

    spans = scan_zstd_frames(src)
    if len(spans) <= 1:
        return zf.decompress(src, verify_checksum)
    workers = min(_default_workers(threads), len(spans))

    def one(span):
        off, size = span
        return zf.decompress(src[off:off + size], verify_checksum)

    if workers <= 1:
        return b"".join(one(s) for s in spans)
    with ThreadPoolExecutor(max_workers=workers) as pool:
        return b"".join(pool.map(one, spans))


# ---------------------------------------------------------------- lz4 ---

def decompress_lz4(src: bytes, threads: int | None = None,
                   verify_checksums: bool = True) -> bytes:
    """Block-parallel decode of block-independent .lz4 frames; falls back
    to the serial frame decoder for linked-block frames."""
    from ..models.lz4 import frame as lf

    parts = []
    pos = 0
    n = len(src)
    workers = _default_workers(threads)
    while pos < n:
        if n - pos < 4:
            raise CorruptError("lz4: trailing garbage")
        magic = int.from_bytes(src[pos:pos + 4], "little")
        if lf.MAGIC_SKIPPABLE_MIN <= magic <= lf.MAGIC_SKIPPABLE_MAX:
            size = int.from_bytes(src[pos + 4:pos + 8], "little")
            pos += 8 + size
            continue
        if magic != lf.MAGIC:
            raise CorruptError(f"lz4: bad magic {magic:#x}")
        flg = src[pos + 4]
        bd = src[pos + 5]
        bmax = 1 << (8 + 2 * max(4, (bd >> 4) & 7))  # 64K..4M
        indep = (flg >> 5) & 1
        if not indep:
            data, used = lf.decompress_frame(src[pos:], verify_checksums)
            parts.append(data)
            pos += used
            continue
        # walk block sizes, decode payloads in the pool, ordered join
        blk_cksum = (flg >> 4) & 1
        has_csize = (flg >> 3) & 1
        cnt_cksum = (flg >> 2) & 1
        p = pos + 4 + 2 + (8 if has_csize else 0) + 1
        blocks = []  # (payload_off, payload_len, is_raw)
        while True:
            if n - p < 4:
                raise CorruptError("lz4: truncated block size")
            word = int.from_bytes(src[p:p + 4], "little")
            p += 4
            if word == 0:
                break
            size = word & 0x7FFFFFFF
            blocks.append((p, size, bool(word >> 31)))
            p += size + (4 if blk_cksum else 0)
            if p > n:
                raise CorruptError("lz4: block overruns input")
        end = p + (4 if cnt_cksum else 0)
        if end > n:
            raise CorruptError("lz4: truncated content checksum")

        from ..models.lz4 import block as bm

        def one(b):
            off, size, raw = b
            payload = src[off:off + size]
            return payload if raw \
                else bm.decompress_block(payload, cap_hint=bmax)

        if workers <= 1:
            decoded = [one(b) for b in blocks]
        else:
            with ThreadPoolExecutor(max_workers=workers) as pool:
                decoded = list(pool.map(one, blocks))
        whole = b"".join(decoded)
        if verify_checksums and cnt_cksum:
            from ..ops.hashing import xxh32_fast
            want = int.from_bytes(src[p:p + 4], "little")
            if xxh32_fast(whole) != want:
                raise CorruptError("lz4: content checksum mismatch")
        parts.append(whole)
        pos = end
    return b"".join(parts)


# -------------------------------------------------------------- lzma2 ---

def scan_lzma2_groups(src: bytes) -> list[tuple[int, int]]:
    """Spans of chunk groups separated by dictionary resets.  Each group
    decodes independently (its first chunk resets the dictionary)."""
    groups = []
    pos = 0
    n = len(src)
    start = None
    while pos < n:
        ctrl = src[pos]
        if ctrl == 0:
            pos += 1
            break
        if ctrl < 0x80:
            if ctrl > 2:
                raise CorruptError(f"lzma2: bad control byte {ctrl:#x}")
            if n - pos < 3:
                raise CorruptError("lzma2: truncated chunk header")
            usize = int.from_bytes(src[pos + 1:pos + 3], "big") + 1
            dict_reset = ctrl == 1
            hlen = 3
            clen = usize
        else:
            reset = (ctrl >> 5) & 3
            dict_reset = reset == 3
            if n - pos < 5:
                raise CorruptError("lzma2: truncated chunk header")
            csize = int.from_bytes(src[pos + 3:pos + 5], "big") + 1
            hlen = 5 + (1 if reset >= 2 else 0)
            clen = csize
        if dict_reset and start is not None:
            groups.append((start, pos - start))
            start = pos
        if start is None:
            if not dict_reset:
                raise CorruptError("lzma2: first chunk must reset dict")
            start = pos
        pos += hlen + clen
        if pos > n:
            raise CorruptError("lzma2: chunk overruns input")
    if start is not None:
        groups.append((start, pos - start if pos <= n else n - start))
    return groups


def decompress_lzma2(src: bytes, threads: int | None = None) -> bytes:
    """Group-parallel LZMA2 decode (dict-reset boundaries = spans, the
    C/Lzma2DecMt.c parallel model); serial result bytes guaranteed."""
    from ..models.lzma import lzma2 as l2

    groups = scan_lzma2_groups(src)
    if len(groups) <= 1:
        return l2.decompress(src)
    workers = min(_default_workers(threads), len(groups))

    def one(span):
        off, size = span
        # a group plus a synthesized end-of-stream control decodes alone
        return l2.decompress(src[off:off + size] + b"\x00")

    if workers <= 1:
        return b"".join(one(g) for g in groups)
    with ThreadPoolExecutor(max_workers=workers) as pool:
        return b"".join(pool.map(one, groups))
