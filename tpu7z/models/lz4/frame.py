"""LZ4 frame format (.lz4).

Behavioral reference: C/lz4/lz4frame.c (LZ4F_compressFrame /
LZ4F_decompress) and the public LZ4 Frame format spec. Layout:

  magic 0x184D2204 (u32le)
  FLG: version=01(bits 7-6) | B.Indep(5) | B.Checksum(4) | C.Size(3)
       | C.Checksum(2) | DictID(0)
  BD:  block max size code in bits 6-4 (4=64K 5=256K 6=1M 7=4M)
  [content size u64le if C.Size]
  HC:  (xxh32(header after magic) >> 8) & 0xFF
  blocks: u32le len (bit31 set => stored uncompressed), data,
          [xxh32 block checksum]; 0 => EndMark
  [content checksum xxh32 if C.Checksum]

Skippable frames (magic 0x184D2A50..5F + u32le size) are parsed and
skipped; tpu7z.containers.skippable uses them as shard boundaries
(reference: C/zstdmt/README.md skippable-frame container).
"""

from __future__ import annotations

import numpy as np

from ...utils.errors import CorruptError
from ...ops.hashing import xxh32_fast as _xxh32
from . import block as lz4block

MAGIC = 0x184D2204
MAGIC_SKIPPABLE_MIN = 0x184D2A50
MAGIC_SKIPPABLE_MAX = 0x184D2A5F

_BD_SIZES = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}


def _pick_bd(block_size: int) -> int:
    for code in (4, 5, 6, 7):
        if block_size <= _BD_SIZES[code]:
            return code
    return 7


def compress_frame(data: bytes, block_size: int = 1 << 22,
                   content_checksum: bool = True,
                   content_size: bool = True,
                   block_checksum: bool = False,
                   block_independence: bool = True,
                   accel: int = 1) -> bytes:
    """Compress `data` into a standalone .lz4 frame.

    Blocks are independent by default, which is what makes the frame
    shardable across a device mesh (each block = one parallel unit).
    """
    bd_code = _pick_bd(block_size)
    bsize = min(block_size, _BD_SIZES[bd_code])

    out = bytearray()
    out += MAGIC.to_bytes(4, "little")
    flg = (1 << 6) | ((1 << 5) if block_independence else 0)
    if block_checksum:
        flg |= 1 << 4
    if content_size:
        flg |= 1 << 3
    if content_checksum:
        flg |= 1 << 2
    hdr = bytearray([flg, bd_code << 4])
    if content_size:
        hdr += len(data).to_bytes(8, "little")
    out += hdr
    out.append((_xxh32(bytes(hdr)) >> 8) & 0xFF)

    for start in range(0, len(data), bsize):
        chunk = data[start:start + bsize]
        if block_independence or start == 0:
            comp = lz4block.compress_block(chunk, accel=accel)
        else:
            window = data[max(start - 65536, 0):start]
            comp = lz4block.compress_block_continuation(chunk, window)
        if len(comp) >= len(chunk):
            out += (len(chunk) | 0x80000000).to_bytes(4, "little")
            payload = chunk
        else:
            out += len(comp).to_bytes(4, "little")
            payload = comp
        out += payload
        if block_checksum:
            out += _xxh32(payload).to_bytes(4, "little")
    out += (0).to_bytes(4, "little")  # EndMark
    if content_checksum:
        out += _xxh32(data).to_bytes(4, "little")
    return bytes(out)


def decompress_frame(src: bytes, verify_checksums: bool = True):
    """Decode one frame starting at src[0].

    Returns (decoded_bytes, bytes_consumed). Skippable frames return
    (b"", consumed).
    """
    if len(src) < 4:
        raise CorruptError("lz4 frame: truncated magic")
    magic = int.from_bytes(src[:4], "little")
    if MAGIC_SKIPPABLE_MIN <= magic <= MAGIC_SKIPPABLE_MAX:
        if len(src) < 8:
            raise CorruptError("lz4 frame: truncated skippable header")
        size = int.from_bytes(src[4:8], "little")
        return b"", 8 + size
    if magic != MAGIC:
        raise CorruptError(f"lz4 frame: bad magic {magic:#x}")

    pos = 4
    if len(src) < pos + 3:
        raise CorruptError("lz4 frame: truncated descriptor")
    flg = src[pos]
    bd = src[pos + 1]
    version = flg >> 6
    if version != 1:
        raise CorruptError(f"lz4 frame: unsupported version {version}")
    b_indep = bool(flg & (1 << 5))
    b_checksum = bool(flg & (1 << 4))
    c_size = bool(flg & (1 << 3))
    c_checksum = bool(flg & (1 << 2))
    dict_id = bool(flg & 1)
    bd_code = (bd >> 4) & 7
    if bd_code not in _BD_SIZES:
        raise CorruptError(f"lz4 frame: bad block size code {bd_code}")
    bsize = _BD_SIZES[bd_code]

    hdr_len = 2 + (8 if c_size else 0) + (4 if dict_id else 0)
    hdr = src[pos:pos + hdr_len]
    pos += hdr_len
    content_size = None
    off = 2
    if c_size:
        content_size = int.from_bytes(hdr[off:off + 8], "little")
        off += 8
    if dict_id:
        raise CorruptError("lz4 frame: dictionaries not supported")
    if pos >= len(src):
        raise CorruptError("lz4 frame: truncated header checksum")
    hc = src[pos]
    pos += 1
    if verify_checksums and ((_xxh32(bytes(hdr)) >> 8) & 0xFF) != hc:
        raise CorruptError("lz4 frame: header checksum mismatch")

    chunks = []
    prev = b""
    while True:
        if pos + 4 > len(src):
            raise CorruptError("lz4 frame: truncated block header")
        bhdr = int.from_bytes(src[pos:pos + 4], "little")
        pos += 4
        if bhdr == 0:
            break
        stored = bool(bhdr & 0x80000000)
        blen = bhdr & 0x7FFFFFFF
        if pos + blen > len(src):
            raise CorruptError("lz4 frame: truncated block")
        payload = src[pos:pos + blen]
        pos += blen
        if b_checksum:
            if pos + 4 > len(src):
                raise CorruptError("lz4 frame: truncated block checksum")
            bc = int.from_bytes(src[pos:pos + 4], "little")
            pos += 4
            if verify_checksums and _xxh32(payload) != bc:
                raise CorruptError("lz4 frame: block checksum mismatch")
        if stored:
            decoded = bytes(payload)
        else:
            if b_indep:
                decoded = lz4block.decompress_block(
                    payload, dst_size=None, cap_hint=bsize) if blen else b""
                if len(decoded) > bsize:
                    raise CorruptError("lz4 frame: block exceeds max size")
            else:
                decoded = _decode_linked(payload, prev, bsize)
        chunks.append(decoded)
        prev = decoded if b_indep else (prev + decoded)[-65536:]
    data = b"".join(chunks)
    if c_checksum:
        if pos + 4 > len(src):
            raise CorruptError("lz4 frame: truncated content checksum")
        cc = int.from_bytes(src[pos:pos + 4], "little")
        pos += 4
        if verify_checksums and _xxh32(data) != cc:
            raise CorruptError("lz4 frame: content checksum mismatch")
    if content_size is not None and len(data) != content_size:
        raise CorruptError("lz4 frame: content size mismatch")
    return data, pos


def _decode_linked(payload: bytes, prev_window: bytes, bsize: int) -> bytes:
    """Decode a block that may reference the previous 64KB window."""
    joined = prev_window + payload  # decode with history prefix
    # decode against history: simplest correct approach — decode into a
    # buffer primed with the window
    s = np.frombuffer(payload, dtype=np.uint8)
    hist = np.frombuffer(prev_window, dtype=np.uint8)
    cap = hist.size + bsize
    out = np.empty(cap, dtype=np.uint8)
    out[:hist.size] = hist
    op = hist.size
    n = s.size
    ip = 0
    while ip < n:
        token = int(s[ip]); ip += 1
        litlen = token >> 4
        if litlen == 15:
            while True:
                b = int(s[ip]); ip += 1
                litlen += b
                if b != 255:
                    break
        out[op:op + litlen] = s[ip:ip + litlen]
        ip += litlen
        op += litlen
        if ip == n:
            break
        offset = int(s[ip]) | (int(s[ip + 1]) << 8)
        ip += 2
        if offset == 0 or offset > op:
            raise CorruptError("lz4 linked block: invalid offset")
        mlen = (token & 15) + lz4block.MIN_MATCH
        if (token & 15) == 15:
            while True:
                b = int(s[ip]); ip += 1
                mlen += b
                if b != 255:
                    break
        start = op - offset
        if offset >= mlen:
            out[op:op + mlen] = out[start:start + mlen]
        else:
            period = out[start:start + offset]
            reps = -(-mlen // offset)
            out[op:op + mlen] = np.tile(period, reps)[:mlen]
        op += mlen
    return out[hist.size:op].tobytes()


def decompress(src: bytes, verify_checksums: bool = True) -> bytes:
    """Decode a concatenation of frames (incl. skippable) to completion."""
    pos = 0
    parts = []
    while pos < len(src):
        data, used = decompress_frame(src[pos:], verify_checksums)
        parts.append(data)
        pos += used
    return b"".join(parts)
