"""Lizard 2.1 codec.

Behavioral reference: C/lizard/lizard_decompress.c (+ _liz.h/_lz4.h
token loops), lizard_frame.c (magic 0x184D2206, LZ4-style frame). The
compressed payload of each frame block is:

  [level byte 10..49]
  chunks until end:
    flags==0x80: uncompressed chunk: LE24 len + raw
    else (bit4 clear): five streams in order
      lengths   : LE24 size + raw              (never entropy-coded)
      offset16  : raw or HUF  (flag bit 2)     HUF: LE24 usize + LE24
      offset24  : raw or HUF  (flag bit 3)          csize + HUF block
      flags     : raw or HUF  (flag bit 1)
      literals  : raw or HUF  (flag bit 0)
    then token decode: levels 10-19 LZ4 code words, 20-49 LIZv1.

HUF streams reuse the zstd Huffman machinery (Lizard embeds a private
copy of the same format, C/lizard/liz_huf_decompress.c).

The encoder covers all four level families: 10-19 LZ4 code words,
20-29 LIZv1 code words (raw streams), 30-39/40-49 the same with each of
the off16/off24/flags/literals streams independently Huffman-coded when
smaller (liz_huf_compress.c analog, sharing the zstd HUF machinery).
"""

from __future__ import annotations

import numpy as np

from ...ops.hashing import xxh32_fast as _xxh32
from ...utils.errors import CorruptError
from ..lz4 import block as lz4block
from ..zstd import huffman as huf

MAGIC = 0x184D2206
MIN_CLEVEL = 10
MAX_CLEVEL = 49
MAX_SHORT_LITLEN = 7
MAX_SHORT_MATCHLEN = 15
LAST_LONG_OFF = 31
MM_LONGOFF = 16
BLOCK_SIZE = 1 << 17


def _huf_decompress(src: bytes, regen: int) -> bytes:
    """HUF_decompress semantics: tree description + 4-stream payload."""
    weights, used = huf.read_tree_description(src)
    sym, nb, table_log = huf.build_decode_table(weights)
    payload = src[used:]
    if len(payload) < 6:
        raise CorruptError("lizard: truncated huf jump table")
    from ...ops import bitchain
    s1 = payload[0] | (payload[1] << 8)
    s2 = payload[2] | (payload[3] << 8)
    s3 = payload[4] | (payload[5] << 8)
    body = payload[6:]
    parts = (body[:s1], body[s1:s1 + s2], body[s1 + s2:s1 + s2 + s3],
             body[s1 + s2 + s3:])
    n123 = (regen + 3) // 4
    counts = (n123, n123, n123, regen - 3 * n123)
    outs = []
    for part, count in zip(parts, counts):
        if count == 0:
            outs.append(np.empty(0, np.uint8))
            continue
        outs.append(bitchain.chain_decode(
            np.frombuffer(part, dtype=np.uint8), sym, nb, table_log,
            count).astype(np.uint8))
    return np.concatenate(outs).tobytes()


class _Streams:
    __slots__ = ("lengths", "off16", "off24", "flags", "literals",
                 "lp", "o16p", "o24p", "fp")

    def __init__(self):
        self.lp = self.o16p = self.o24p = self.fp = 0


def _read_stream(src: bytes, pos: int, compressed: bool):
    if not compressed:
        if pos + 3 > len(src):
            raise CorruptError("lizard: truncated stream header")
        size = int.from_bytes(src[pos:pos + 3], "little")
        if pos + 3 + size > len(src):
            raise CorruptError("lizard: truncated stream")
        return src[pos + 3:pos + 3 + size], pos + 3 + size
    if pos + 6 > len(src):
        raise CorruptError("lizard: truncated huf stream header")
    usize = int.from_bytes(src[pos:pos + 3], "little")
    csize = int.from_bytes(src[pos + 3:pos + 6], "little")
    if pos + 6 + csize > len(src):
        raise CorruptError("lizard: truncated huf stream")
    data = _huf_decompress(src[pos + 6:pos + 6 + csize], usize)
    return data, pos + 6 + csize


def _read_ext_len(st: _Streams, base: int) -> int:
    lit = st.literals
    if st.lp >= len(lit):
        raise CorruptError("lizard: missing extended length")
    v = lit[st.lp]
    if v < 254:
        st.lp += 1
        return v + base
    if v == 254:
        out = lit[st.lp + 1] | (lit[st.lp + 2] << 8)
        st.lp += 3
        return out + base
    out = lit[st.lp + 1] | (lit[st.lp + 2] << 8) | (lit[st.lp + 3] << 16)
    st.lp += 4
    return out + base


def _decode_chunk_lz4(st: _Streams, out: bytearray):
    """Lizard LZ4 code words (lizard_decompress_lz4.h semantics)."""
    flags = st.flags
    lit = st.literals
    while st.fp < len(flags):
        token = flags[st.fp]
        st.fp += 1
        litlen = token & 15
        if litlen == 15:
            litlen = _read_ext_len(st, 15)
        out += lit[st.lp:st.lp + litlen]
        st.lp += litlen
        offset = lit[st.lp] | (lit[st.lp + 1] << 8)
        st.lp += 2
        mlen = token >> 4
        if mlen == 15:
            mlen = _read_ext_len(st, 15)
        mlen += 4
        _copy_match(out, offset, mlen)
    # last literals
    out += lit[st.lp:]
    st.lp = len(lit)


def _decode_chunk_liz(st: _Streams, out: bytearray, last_off: int) -> int:
    """LIZv1 code words (lizard_decompress_liz.h semantics)."""
    flags = st.flags
    lit = st.literals
    while st.fp < len(flags):
        token = flags[st.fp]
        st.fp += 1
        if token >= 32:
            litlen = token & MAX_SHORT_LITLEN
            if litlen == MAX_SHORT_LITLEN:
                litlen = _read_ext_len(st, MAX_SHORT_LITLEN)
            out += lit[st.lp:st.lp + litlen]
            st.lp += litlen
            if (token >> 7) == 0:
                if st.o16p + 2 <= len(st.off16):
                    last_off = st.off16[st.o16p] \
                        | (st.off16[st.o16p + 1] << 8)
                    st.o16p += 2
            mlen = (token >> 3) & MAX_SHORT_MATCHLEN
            if mlen == MAX_SHORT_MATCHLEN:
                mlen = _read_ext_len(st, MAX_SHORT_MATCHLEN)
        elif token < LAST_LONG_OFF:
            mlen = token + MM_LONGOFF
            last_off = int.from_bytes(st.off24[st.o24p:st.o24p + 3],
                                      "little")
            st.o24p += 3
        else:
            mlen = _read_ext_len(st, LAST_LONG_OFF + MM_LONGOFF)
            last_off = int.from_bytes(st.off24[st.o24p:st.o24p + 3],
                                      "little")
            st.o24p += 3
        if mlen:
            _copy_match(out, last_off, mlen)
    out += lit[st.lp:]
    st.lp = len(lit)
    return last_off


def _copy_match(out: bytearray, offset: int, mlen: int):
    if offset == 0 or offset > len(out):
        raise CorruptError("lizard: bad match offset")
    start = len(out) - offset
    if offset >= mlen:
        out += out[start:start + mlen]
    else:
        chunk = out[start:]
        while mlen > 0:
            take = min(mlen, len(chunk))
            out += chunk[:take]
            mlen -= take


def decompress_block(src: bytes, max_out: int) -> bytes:
    if len(src) < 1:
        raise CorruptError("lizard: empty block")
    level = src[0]
    if not MIN_CLEVEL <= level <= MAX_CLEVEL:
        raise CorruptError(f"lizard: bad level byte {level}")
    # level families (lizard README): 10-19 fastLZ4, 20-29 LIZv1,
    # 30-39 fastLZ4+Huffman, 40-49 LIZv1+Huffman
    liz_words = (20 <= level <= 29) or (40 <= level <= 49)
    pos = 1
    out = bytearray()
    while pos < len(src):
        flags = src[pos]
        pos += 1
        if flags == 0x80:
            length = int.from_bytes(src[pos:pos + 3], "little")
            pos += 3
            out += src[pos:pos + length]
            pos += length
            continue
        if flags & 0x10:
            raise CorruptError("lizard: reserved chunk flag")
        st = _Streams()
        st.lengths, pos = _read_stream(src, pos, False)
        st.off16, pos = _read_stream(src, pos, bool(flags & 4))
        st.off24, pos = _read_stream(src, pos, bool(flags & 8))
        st.flags, pos = _read_stream(src, pos, bool(flags & 2))
        st.literals, pos = _read_stream(src, pos, bool(flags & 1))
        if liz_words:
            _decode_chunk_liz(st, out, 0)
        else:
            _decode_chunk_lz4(st, out)
        if len(out) > max_out:
            raise CorruptError("lizard: output overflow")
    return bytes(out)


# ---------------------------------------------------------------------------
# Encoder: LZ4 code words, raw streams (valid subset)
# ---------------------------------------------------------------------------

def compress_block(data: bytes, level: int = 11) -> bytes:
    liz_words = (20 <= level <= 29) or (40 <= level <= 49)
    entropy = level >= 30  # 30-49: Huffman-coded streams
    out = bytearray([level])
    for start in range(0, max(len(data), 1), BLOCK_SIZE):
        chunk = data[start:start + BLOCK_SIZE]
        out += (_encode_chunk_liz(chunk, entropy) if liz_words
                else _encode_chunk_lz4(chunk, entropy))
    return bytes(out)


def _huf_compress(data: bytes):
    """HUF_compress4X payload (tree + jump table + 4 backward streams,
    liz_huf_compress.c format = zstd's): None when not smaller."""
    from ...ops.bitstream import pack_bits_lsb
    lits = np.frombuffer(data, np.uint8)
    if lits.size < 64:
        return None
    hist = np.bincount(lits, minlength=256)
    if np.count_nonzero(hist) < 2:
        return None
    built = huf.build_weights(hist)
    if built is None:
        return None
    weights, nsym = built
    tree = huf.write_tree_description(weights, nsym)
    if tree is None:
        return None
    code_val, code_bits, _tl = huf.build_encode_table(weights)
    n123 = (lits.size + 3) // 4
    parts = [lits[:n123], lits[n123:2 * n123],
             lits[2 * n123:3 * n123], lits[3 * n123:]]
    streams = []
    for p in parts:
        if p.size == 0:
            streams.append(b"")
            continue
        vals = code_val[p].astype(np.uint64)[::-1]
        nbs = code_bits[p].astype(np.int64)[::-1]
        streams.append(pack_bits_lsb(vals, nbs, end_marker=True))
    if any(len(s) > 0xFFFF for s in streams[:3]):
        return None
    jump = b"".join(len(x).to_bytes(2, "little") for x in streams[:3])
    payload = tree + jump + b"".join(streams)
    if len(payload) + 3 >= len(data):
        return None
    return payload


def _emit_streams(off16: bytes, off24: bytes, flags: bytes, lit: bytes,
                  entropy: bool) -> bytes:
    """Chunk body: flags byte + the 5 streams, Huffman-compressing each
    of off16/off24/flags/literals independently when `entropy` (levels
    30-49, liz_huf_compress.c) and smaller."""
    fbits = 0
    parts = []
    for bit, data in ((4, off16), (8, off24), (2, flags), (1, lit)):
        comp = _huf_compress(bytes(data)) if entropy else None
        if comp is not None:
            fbits |= bit
            parts.append(len(data).to_bytes(3, "little")
                         + len(comp).to_bytes(3, "little") + comp)
        else:
            parts.append(len(data).to_bytes(3, "little") + bytes(data))
    body = bytearray([fbits])
    body += (0).to_bytes(3, "little")       # lengths stream (unused)
    for p in parts:
        body += p
    return bytes(body)


def _encode_chunk_liz(chunk: bytes, entropy: bool = False) -> bytes:
    """LIZv1 code words (lizard_compress_liz.h behavior re-derived from
    the decoder token forms): short tokens carry a 16-bit offset or
    repeat the previous one (bit 7); tokens < 31 are long-offset
    (24-bit) matches of length >= 16 with no literal run."""
    s = np.frombuffer(chunk, dtype=np.uint8)
    n = s.size
    mpos, mlen, moff = _find_liz(s)
    flags = bytearray()
    lit = bytearray()
    off16 = bytearray()
    off24 = bytearray()
    pos = 0
    last_off = 0

    def emit_lits(litlen, p):
        # literal-only run: repeat-offset token with mlen = 0
        flags.append(0x80 | min(litlen, MAX_SHORT_LITLEN))
        if litlen >= MAX_SHORT_LITLEN:
            _ext_len(lit, litlen - MAX_SHORT_LITLEN)
        lit.extend(chunk[p - litlen:p])

    for i in range(mpos.size):
        p, l, o = int(mpos[i]), int(mlen[i]), int(moff[i])
        litlen = p - pos
        if o == last_off or o <= 0xFFFF:
            token = min(litlen, MAX_SHORT_LITLEN) \
                | (min(l, MAX_SHORT_MATCHLEN) << 3)
            if o == last_off:
                token |= 0x80
            flags.append(token)
            if litlen >= MAX_SHORT_LITLEN:
                _ext_len(lit, litlen - MAX_SHORT_LITLEN)
            lit += chunk[pos:p]
            if o != last_off:
                off16 += o.to_bytes(2, "little")
            if l >= MAX_SHORT_MATCHLEN:
                _ext_len(lit, l - MAX_SHORT_MATCHLEN)
        else:
            # long-offset token carries no literal run
            if litlen:
                emit_lits(litlen, p)
            if l < LAST_LONG_OFF + MM_LONGOFF:
                flags.append(l - MM_LONGOFF)
            else:
                flags.append(LAST_LONG_OFF)
                _ext_len(lit, l - (LAST_LONG_OFF + MM_LONGOFF))
            off24 += o.to_bytes(3, "little")
        last_off = o
        pos = p + l
    lit += chunk[pos:]
    return _emit_streams(bytes(off16), bytes(off24), bytes(flags),
                         bytes(lit), entropy)


def _find_liz(s: np.ndarray):
    """Matches for LIZv1: offsets >= 8 with window up to the chunk size;
    16-bit-offset matches need length >= 4, longer offsets length >= 16
    (MM_LONGOFF)."""
    n = s.size
    if n < 48:
        return (np.empty(0, np.int64),) * 3
    from ..zstd import compressor as zc
    mpos, mlen, moff = zc.find_sequences_windowed(
        s, hashlog=16, window_log=max(10, (n - 1).bit_length()),
        depth=2, lazy=1)
    # reference decoder fast-path end margins (lizard_decompress_liz.h):
    # keep the tail as plain literals, truncate matches at the cap
    mlen = np.minimum(mlen, (n - 24) - mpos)
    keep = (moff >= 8) & (mpos <= (n - 32)) \
        & (mlen >= np.where(moff <= 0xFFFF, 4, MM_LONGOFF))
    return mpos[keep], mlen[keep], moff[keep]


def _encode_chunk_lz4(chunk: bytes, entropy: bool = False) -> bytes:
    s = np.frombuffer(chunk, dtype=np.uint8)
    n = s.size
    mpos, mlen, moff = _find(s)
    flags = bytearray()
    lit = bytearray()
    pos = 0
    for i in range(mpos.size):
        p, l, o = int(mpos[i]), int(mlen[i]), int(moff[i])
        litlen = p - pos
        token_lit = min(litlen, 15)
        token_ml = min(l - 4, 15)
        flags.append(token_lit | (token_ml << 4))
        if litlen >= 15:
            _ext_len(lit, litlen - 15)
        lit += chunk[pos:p]
        lit += o.to_bytes(2, "little")
        if l - 4 >= 15:
            _ext_len(lit, l - 4 - 15)
        pos = p + l
    # trailing literals: no token, just append
    lit += chunk[pos:]
    return _emit_streams(b"", b"", bytes(flags), bytes(lit), entropy)


def _ext_len(buf: bytearray, v: int):
    if v < 254:
        buf.append(v)
    elif v <= 0xFFFF:
        buf.append(254)
        buf += v.to_bytes(2, "little")
    else:
        buf.append(255)
        buf += v.to_bytes(3, "little")


def _find(s: np.ndarray):
    n = s.size
    if n < 16:
        return (np.empty(0, np.int64),) * 3
    cand = lz4block._find_candidates(s, hashlog=16)
    pos_all = np.arange(cand.size, dtype=np.int64)
    offset = pos_all - cand
    # the reference decoder's wildcopy fast path requires generous end
    # margins (lizard_decompress_lz4.h bounds: 16B output margin, 18B
    # literal-stream margin) — keep the last 32 bytes as plain literals
    # LIZARD_FAST_MIN_OFFSET: the reference decoder's 8-byte block copies
    # require offsets >= 8
    valid = (cand >= 0) & (offset >= 8) & (offset <= 0xFFFF) \
        & (pos_all <= n - 32)
    limit = np.zeros(cand.size, dtype=np.int64)
    limit[valid] = (n - 24) - pos_all[valid]
    mlen = np.zeros(cand.size, dtype=np.int64)
    vidx = np.where(valid)[0]
    if vidx.size:
        mlen[vidx] = lz4block._match_lengths(s, pos_all[vidx], cand[vidx],
                                             limit[vidx])
    valid &= mlen >= 4
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
    return m_sel, vm[m_sel], vo[m_sel]


# --- frame layer (LZ4-style, magic 0x184D2206) -----------------------------

_BD_SIZES = {1: 128 * 1024, 4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}


def compress_frame(data: bytes, block_size: int = 1 << 17,
                   level: int = 11) -> bytes:
    out = bytearray()
    out += MAGIC.to_bytes(4, "little")
    flg = (1 << 6) | (1 << 5) | (1 << 3) | (1 << 2)
    bd_code = 1  # lizard block size id 1 = LIZARD_BLOCK_SIZE (128 KiB)
    bsize = _BD_SIZES[bd_code]
    hdr = bytearray([flg, bd_code << 4])
    hdr += len(data).to_bytes(8, "little")
    out += hdr
    out.append((_xxh32(bytes(hdr)) >> 8) & 0xFF)
    for start in range(0, len(data), bsize):
        chunk = data[start:start + bsize]
        comp = compress_block(chunk, level=level)
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
        raise CorruptError("lizard frame: truncated")
    magic = int.from_bytes(src[:4], "little")
    if 0x184D2A50 <= magic <= 0x184D2A5F:
        size = int.from_bytes(src[4:8], "little")
        return b"", 8 + size
    if magic != MAGIC:
        raise CorruptError(f"lizard frame: bad magic {magic:#x}")
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
    pos += 1
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
                      else decompress_block(payload, bsize))
    data = b"".join(chunks)
    if c_checksum:
        want = int.from_bytes(src[pos:pos + 4], "little")
        if _xxh32(data) != want:
            raise CorruptError("lizard frame: content checksum mismatch")
        pos += 4
    if content_size is not None and len(data) != content_size:
        raise CorruptError("lizard frame: size mismatch")
    return data, pos


def decompress(src: bytes) -> bytes:
    pos = 0
    parts = []
    while pos < len(src):
        data, used = decompress_frame(src[pos:])
        parts.append(data)
        pos += used
    return b"".join(parts)
