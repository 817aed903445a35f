"""LZ5 1.5 codec.

Behavioral reference: C/lz5/lz5.c (LZ5_decompress_generic) and
lz5frame.c (frame magic 0x184D2205, layout shared with the LZ4 frame).
Block format (MINMATCH=3):

  token bits [7..0]:
    1 o o l l m m m   short offset: 10 bits = oo<<8 | next byte
    0 0 l l l m m m   16-bit offset (LE16 follows literals)
    0 1 0 l l m m m   24-bit offset (LE24)
    0 1 1 l l m m m   repeat last offset (no offset bytes)
  lit field: 3 bits when high bits are 00, else 2 bits; 255-extension.
  match field: 3 bits + 255-extension, + MINMATCH.

The encoder (vectorized, shared matcher) emits 16-bit-offset and repeat
tokens — a valid subset of the format the reference decoder accepts.
"""

from __future__ import annotations

import numpy as np

from ...ops.hashing import xxh32_fast as _xxh32
from ...utils.errors import CorruptError
from ..lz4 import block as lz4block

MIN_MATCH = 3
LAST_LITERALS = 5
MF_LIMIT = 12
MAGIC = 0x184D2205


def decompress_block(src: bytes, dst_size: int | None = None,
                     max_out: int | None = None) -> bytes:
    s = np.frombuffer(src, dtype=np.uint8)
    n = s.size
    if dst_size is not None:
        cap = dst_size
    elif max_out is not None:
        cap = max_out
    else:
        cap = max(64, n * 256)
    out = np.empty(cap, dtype=np.uint8)
    ip = 0
    op = 0
    last_off = 1
    while ip < n:
        token = int(s[ip]); ip += 1
        if token >> 6:
            litlen = (token >> 3) & 3
            if litlen == 3:
                while True:
                    b = int(s[ip]); ip += 1
                    litlen += b
                    if b != 255:
                        break
        else:
            litlen = (token >> 3) & 7
            if litlen == 7:
                while True:
                    b = int(s[ip]); ip += 1
                    litlen += b
                    if b != 255:
                        break
        if ip + litlen > n or op + litlen > cap:
            raise CorruptError("lz5: literal overrun")
        out[op:op + litlen] = s[ip:ip + litlen]
        ip += litlen
        op += litlen
        if ip >= n:
            break
        # offset
        if token >> 7:
            offset = int(s[ip]) + (((token >> 5) & 3) << 8)
            ip += 1
        elif (token >> 6) == 0:
            offset = int(s[ip]) | (int(s[ip + 1]) << 8)
            ip += 2
        elif (token >> 5) == 2:
            offset = int(s[ip]) | (int(s[ip + 1]) << 8) \
                | (int(s[ip + 2]) << 16)
            ip += 3
        else:  # (token >> 5) == 3
            offset = last_off
        last_off = offset
        mlen = token & 7
        if mlen == 7:
            while True:
                b = int(s[ip]); ip += 1
                mlen += b
                if b != 255:
                    break
        mlen += MIN_MATCH
        if offset == 0 or offset > op or op + mlen > cap:
            raise CorruptError("lz5: bad match")
        start = op - offset
        if offset >= mlen:
            out[op:op + mlen] = out[start:start + mlen]
        else:
            period = out[start:start + offset]
            reps = -(-mlen // offset)
            out[op:op + mlen] = np.tile(period, reps)[:mlen]
        op += mlen
    if dst_size is not None and op != dst_size:
        raise CorruptError(f"lz5: decoded {op}, expected {dst_size}")
    return out[:op].tobytes()


def compress_block(src: bytes) -> bytes:
    s = np.frombuffer(src, dtype=np.uint8)
    n = s.size
    if n == 0:
        return b"\x00"
    if n < MF_LIMIT + 1:
        return _emit(s, np.empty(0, np.int64), np.empty(0, np.int64),
                     np.empty(0, np.int64))
    cand = lz4block._find_candidates(s, hashlog=16)
    pos_all = np.arange(cand.size, dtype=np.int64)
    offset = pos_all - cand
    valid = (cand >= 0) & (offset <= 0xFFFF) \
        & (pos_all <= n - MF_LIMIT - 1)
    limit = np.zeros(cand.size, dtype=np.int64)
    limit[valid] = (n - LAST_LITERALS) - pos_all[valid]
    mlen = np.zeros(cand.size, dtype=np.int64)
    vidx = np.where(valid)[0]
    if vidx.size:
        mlen[vidx] = lz4block._match_lengths(s, pos_all[vidx], cand[vidx],
                                             limit[vidx])
    valid &= mlen >= MIN_MATCH + 1  # leave margin; min 4 keeps parity
    nxt = np.where(valid, pos_all + mlen, pos_all + 1)
    full_next = np.full(n, n, dtype=np.int64)
    full_next[: nxt.size] = nxt
    visited = lz4block._greedy_parse(full_next, n)
    is_match = np.zeros(n, dtype=bool)
    vm = np.zeros(n, dtype=np.int64)
    vo = np.zeros(n, dtype=np.int64)
    is_match[: valid.size] = valid
    vm[: mlen.size] = mlen
    vo[: offset.size] = offset
    m_sel = visited[is_match[visited]]
    return _emit(s, m_sel, vm[m_sel], vo[m_sel])


def _emit(s: np.ndarray, mpos, mlen, moff) -> bytes:
    """Sequence emission: 16-bit offsets, repeat tokens when possible."""
    out = bytearray()
    n = s.size
    pos = 0
    last_off = 1
    for i in range(mpos.size):
        p, l, o = int(mpos[i]), int(mlen[i]), int(moff[i])
        lit = p - pos
        rep = o == last_off
        ml_code = min(l - MIN_MATCH, 7)
        if rep:
            lit_code = min(lit, 3)
            token = (0b011 << 5) | (lit_code << 3) | ml_code
        else:
            lit_code = min(lit, 7)
            token = (lit_code << 3) | ml_code
        out.append(token)
        _ext(out, lit, 3 if rep else 7)
        out += s[pos:p].tobytes()
        if not rep:
            out += o.to_bytes(2, "little")
        _ext(out, l - MIN_MATCH, 7)
        last_off = o
        pos = p + l
    lit = n - pos
    token = min(lit, 7) << 3
    out.append(token)
    _ext(out, lit, 7)
    out += s[pos:].tobytes()
    return bytes(out)


def _ext(out: bytearray, value: int, mask: int):
    if value >= mask:
        v = value - mask
        while v >= 255:
            out.append(255)
            v -= 255
        out.append(v)


# --- frame layer (same structure as LZ4 frame, magic 0x184D2205) ----------

_BD_SIZES = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}


def compress_frame(data: bytes, block_size: int = 1 << 22) -> bytes:
    bd_code = next(c for c in (4, 5, 6, 7) if block_size <= _BD_SIZES[c])
    bsize = min(block_size, _BD_SIZES[bd_code])
    out = bytearray()
    out += MAGIC.to_bytes(4, "little")
    flg = (1 << 6) | (1 << 5) | (1 << 3) | (1 << 2)
    hdr = bytearray([flg, bd_code << 4])
    hdr += len(data).to_bytes(8, "little")
    out += hdr
    out.append((_xxh32(bytes(hdr)) >> 8) & 0xFF)
    for start in range(0, len(data), bsize):
        chunk = data[start:start + bsize]
        comp = compress_block(chunk)
        if len(comp) >= len(chunk):
            out += (len(chunk) | 0x80000000).to_bytes(4, "little")
            out += chunk
        else:
            out += len(comp).to_bytes(4, "little")
            out += comp
    out += (0).to_bytes(4, "little")
    out += _xxh32(data).to_bytes(4, "little")
    return bytes(out)


def decompress_frame(src: bytes):
    if len(src) < 7:
        raise CorruptError("lz5 frame: truncated")
    magic = int.from_bytes(src[:4], "little")
    if 0x184D2A50 <= magic <= 0x184D2A5F:
        size = int.from_bytes(src[4:8], "little")
        return b"", 8 + size
    if magic != MAGIC:
        raise CorruptError(f"lz5 frame: bad magic {magic:#x}")
    flg = src[4]
    bd = src[5]
    c_size = bool(flg & (1 << 3))
    c_checksum = bool(flg & (1 << 2))
    b_checksum = bool(flg & (1 << 4))
    pos = 6
    content_size = None
    if c_size:
        content_size = int.from_bytes(src[pos:pos + 8], "little")
        pos += 8
    pos += 1  # header checksum
    bsize = _BD_SIZES.get((bd >> 4) & 7, 1 << 22)
    chunks = []
    while True:
        bhdr = int.from_bytes(src[pos:pos + 4], "little")
        pos += 4
        if bhdr == 0:
            break
        stored = bool(bhdr & 0x80000000)
        blen = bhdr & 0x7FFFFFFF
        payload = src[pos:pos + blen]
        pos += blen
        if b_checksum:
            pos += 4
        chunks.append(bytes(payload) if stored
                      else decompress_block(payload, max_out=bsize))
    data = b"".join(chunks)
    if c_checksum:
        want = int.from_bytes(src[pos:pos + 4], "little")
        if _xxh32(data) != want:
            raise CorruptError("lz5 frame: content checksum mismatch")
        pos += 4
    if content_size is not None and len(data) != content_size:
        raise CorruptError("lz5 frame: size mismatch")
    return data, pos


def decompress(src: bytes) -> bytes:
    pos = 0
    parts = []
    while pos < len(src):
        data, used = decompress_frame(src[pos:])
        parts.append(data)
        pos += used
    return b"".join(parts)
