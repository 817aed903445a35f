"""Zstd encoder.

Behavioral reference: RFC 8878 (format) and C/zstd/zstd_compress.c
(ZSTD_compressBlock_internal:4383 = ZSTD_buildSeqStore +
ZSTD_entropyCompressSeqStore_internal), zstd_compress_sequences.c:419
(ZSTD_encodeSequences). Written from the spec; the parse is free to
differ from the reference (any valid parse decodes bit-exactly — the
reference's own regression suite only pins decoded bytes).

TPU-first design:
- match finding: vectorized hash/sort candidate search + widening
  match-length passes + pointer-doubling greedy parse (shared design with
  models/lz4/block.py; device twin in tpu7z.ops).
- literals: package-merge optimal length-limited Huffman, 4 independent
  streams packed with the vectorized bit packer.
- sequences: FSE with per-block normalized tables (or predefined/RLE
  modes when smaller); the interleaved-state stream is emitted as
  (value, nbits) arrays and packed in one vectorized pass.
"""

from __future__ import annotations

import numpy as np

from ...ops.bitstream import pack_bits_lsb
from ...ops.hashing import xxh64_fast as _xxh64
from ...utils.errors import ParamError
from ..lz4 import block as lz4block
from . import fse, huffman
from . import sequences as seq_mod
from .frame import MAX_BLOCK_SIZE, write_frame_header

MIN_MATCH = 3


# ---------------------------------------------------------------------------
# Sequence extraction (per block)
# ---------------------------------------------------------------------------

def _greedy_parse_from(next_pos: np.ndarray, n: int, start: int) -> np.ndarray:
    """Pointer-doubling cursor walk of next_pos starting at `start`
    (lz4block._greedy_parse generalized to a nonzero origin)."""
    sentinel = n
    nxt = np.minimum(next_pos, sentinel)
    visited = np.array([start], dtype=np.int64)
    jump = nxt
    steps = 1
    while steps < n + 1:
        ext = jump[np.minimum(visited, n - 1)]
        ext = np.where(visited >= n, sentinel, ext)
        visited = np.unique(np.concatenate([visited, ext]))
        j2 = jump[np.minimum(jump, n - 1)]
        jump = np.where(jump >= n, sentinel, j2)
        steps *= 2
    return visited[(visited < n) & (visited >= start)]


def _parse_segment(s: np.ndarray, base: int, hashlog: int, max_offset: int,
                   depth: int = 2, lazy: int = 0):
    """Best-match parse of s[base:]; candidate sources may lie in the
    history prefix s[:base]. Returns (mpos, mlen, moff) relative to s.

    depth-k candidate chains (data-parallel hash-chain walk: one stable
    sort, k sorted-neighbor gathers — the FL2 radix-MF idea applied to the
    zstd matcher, vs the reference's pointer-chasing BT/HC finders in
    C/zstd/zstd_lazy.c). `lazy` in {0,1,2} = how many one-byte defers a
    position concedes to a strictly better successor match
    (ZSTD_compressBlock_lazy/lazy2 analog, C/zstd/zstd_lazy.c:1828,
    vectorized as a local score comparison instead of a serial re-search).
    """
    n = s.size
    if n - base < 16:
        return (np.empty(0, np.int64),) * 3
    cands = lz4block._find_candidates_multi(s, hashlog=hashlog, depth=depth)
    phash = lz4block.build_prefix_hash(s)
    m = cands[0].size
    pos_all = np.arange(m, dtype=np.int64)
    best_len = np.zeros(m, dtype=np.int64)
    best_off = np.zeros(m, dtype=np.int64)
    best_score = np.full(m, -(1 << 30), dtype=np.int64)
    for cand in cands:
        offset = pos_all - cand
        ok = ((cand >= 0) & (offset <= max_offset) & (pos_all >= base)
              & (pos_all <= n - 8))
        mlen = np.zeros(m, dtype=np.int64)
        vidx = np.where(ok)[0]
        if vidx.size:
            limit = n - pos_all[vidx]
            mlen[vidx] = lz4block.match_lengths_hashed(
                phash, pos_all[vidx], cand[vidx], limit)
        # price-aware selection: ~8 bits saved per matched byte minus the
        # offset-code extra bits (the ZSTD_compressBlock price model of
        # zstd_opt.c distilled to its first-order term)
        score = 8 * mlen - seq_mod.floor_log2(np.maximum(offset, 1))
        score = np.where(mlen >= 4, score, -(1 << 30))
        better = score > best_score
        best_score = np.where(better, score, best_score)
        best_len = np.where(better, mlen, best_len)
        best_off = np.where(better, offset, best_off)
    valid = best_len >= 4
    # lazy deferral: a match at p yields to a strictly better one at p+1
    # (cost of deferring = one literal ≈ 6 bits)
    for _ in range(lazy):
        nxt_score = np.empty(m, dtype=np.int64)
        nxt_score[:-1] = best_score[1:]
        nxt_score[-1] = -(1 << 30)
        defer = valid & (nxt_score > best_score + 6)
        defer[:-1] &= valid[1:]
        valid &= ~defer
    next_pos = np.where(valid, pos_all + best_len, pos_all + 1)
    full_next = np.full(n, n, dtype=np.int64)
    full_next[: next_pos.size] = next_pos
    visited = _greedy_parse_from(full_next, n, base)
    is_match = np.zeros(n, dtype=bool)
    vm = np.zeros(n, dtype=np.int64)
    voff = np.zeros(n, dtype=np.int64)
    is_match[: valid.size] = valid
    vm[: best_len.size] = best_len
    voff[: best_off.size] = best_off
    m_sel = visited[is_match[visited]]
    return m_sel, vm[m_sel], voff[m_sel]


def find_sequences_windowed(s: np.ndarray, hashlog: int, window_log: int,
                            depth: int = 2, lazy: int = 0,
                            seg_size: int = 1 << 22):
    """Whole-input parse with a sliding history window (the cross-block
    match window that the reference gets from its contiguous dictionary,
    C/zstd/zstd_compress.c ZSTD_buildSeqStore over cctx->window).

    Segments bound peak memory: each segment [a, b) is parsed against
    history s[a-hist : a] with hist = min(a, window). Matches never cross
    a segment end (capped by the per-position limit), which costs a
    negligible number of split matches every `seg_size` bytes.
    """
    n = s.size
    window = 1 << window_log
    out_p, out_l, out_o = [], [], []
    for a in range(0, n, seg_size):
        b = min(a + seg_size, n)
        hist = min(a, window)
        sub = s[a - hist: b]
        mp, ml, mo = _parse_segment(sub, hist, hashlog, window,
                                    depth=depth, lazy=lazy)
        out_p.append(mp + (a - hist))
        out_l.append(ml)
        out_o.append(mo)
    if not out_p:
        return (np.empty(0, np.int64),) * 3
    return (np.concatenate(out_p), np.concatenate(out_l),
            np.concatenate(out_o))


def _split_at_block_boundaries(mpos, mlen, moff, block_size):
    """Split matches that straddle a block boundary (a zstd block's
    sequences regenerate exactly that block's bytes; pieces shorter than
    the 3-byte minimum match fall back to literals)."""
    if mpos.size == 0:
        return mpos, mlen, moff
    crosses = (mpos // block_size) != ((mpos + mlen - 1) // block_size)
    if not crosses.any():
        return mpos, mlen, moff
    keep = ~crosses
    pieces_p = [mpos[keep]]
    pieces_l = [mlen[keep]]
    pieces_o = [moff[keep]]
    for p, l, o in zip(mpos[crosses], mlen[crosses], moff[crosses]):
        p, l, o = int(p), int(l), int(o)
        while l > 0:
            room = block_size - (p % block_size)
            take = min(l, room)
            if take >= MIN_MATCH:
                pieces_p.append(np.array([p], dtype=np.int64))
                pieces_l.append(np.array([take], dtype=np.int64))
                pieces_o.append(np.array([o], dtype=np.int64))
            p += take
            l -= take
    mp = np.concatenate(pieces_p)
    order = np.argsort(mp, kind="stable")
    return (mp[order], np.concatenate(pieces_l)[order],
            np.concatenate(pieces_o)[order])


# ---------------------------------------------------------------------------
# Literals section encode
# ---------------------------------------------------------------------------

def _encode_literals(lits: np.ndarray) -> bytes:
    """Emit a Literals_Section (choosing Raw / RLE / Compressed)."""
    n = lits.size
    raw = _literals_raw(lits)
    if n == 0:
        return raw
    if np.all(lits == lits[0]):
        return _literals_rle(int(lits[0]), n)
    if n < 32:
        return raw
    hist = np.bincount(lits, minlength=256)
    built = huffman.build_weights(hist)
    if built is None:
        return raw
    weights, nsym = built
    tree = huffman.write_tree_description(weights, nsym)
    if tree is None:
        return raw
    code_val, code_bits, _tl = huffman.build_encode_table(weights)

    use_4 = n >= 256
    if use_4:
        n123 = (n + 3) // 4
        parts = [lits[0:n123], lits[n123:2 * n123], lits[2 * n123:3 * n123],
                 lits[3 * n123:]]
        streams = []
        for p in parts:
            streams.append(_huf_stream(p, code_val, code_bits))
        jump = b"".join(len(x).to_bytes(2, "little") for x in streams[:3])
        payload = tree + jump + b"".join(streams)
    else:
        payload = tree + _huf_stream(lits, code_val, code_bits)
    hdr = _literals_comp_header(n, len(payload), use_4)
    if hdr is None or len(hdr) + len(payload) >= len(raw):
        return raw
    return hdr + payload


def _huf_stream(symbols: np.ndarray, code_val, code_bits) -> bytes:
    """One Huffman stream: symbols written in reverse order so the
    backward-reading decoder emits them forward."""
    vals = code_val[symbols].astype(np.uint64)[::-1]
    nbs = code_bits[symbols].astype(np.int64)[::-1]
    return pack_bits_lsb(vals, nbs, end_marker=True)


def _literals_raw(lits: np.ndarray) -> bytes:
    n = lits.size
    if n < 32:
        hdr = bytes([(n << 3) | 0])  # size_format 00, type raw
    elif n < 4096:
        hdr = bytes([((n & 0xF) << 4) | (1 << 2) | 0, (n >> 4) & 0xFF])
    else:
        hdr = bytes([((n & 0xF) << 4) | (3 << 2) | 0, (n >> 4) & 0xFF,
                     (n >> 12) & 0xFF])
    return hdr + lits.tobytes()


def _literals_rle(byte: int, n: int) -> bytes:
    if n < 32:
        hdr = bytes([(n << 3) | 1])
    elif n < 4096:
        hdr = bytes([((n & 0xF) << 4) | (1 << 2) | 1, (n >> 4) & 0xFF])
    else:
        hdr = bytes([((n & 0xF) << 4) | (3 << 2) | 1, (n >> 4) & 0xFF,
                     (n >> 12) & 0xFF])
    return hdr + bytes([byte])


def _literals_comp_header(regen: int, csize: int, four: bool):
    if not four:
        if regen > 1023 or csize > 1023:
            return None
        h = 2 | (0 << 2) | (regen << 4) | (csize << 14)
        return h.to_bytes(3, "little")
    if regen <= 1023 and csize <= 1023:
        h = 2 | (1 << 2) | (regen << 4) | (csize << 14)
        return h.to_bytes(3, "little")
    if regen <= 0x3FFF and csize <= 0x3FFF:
        h = 2 | (2 << 2) | (regen << 4) | (csize << 18)
        return h.to_bytes(4, "little")
    if regen <= 0x3FFFF and csize <= 0x3FFFF:
        h = 2 | (3 << 2) | (regen << 4) | (csize << 22)
        return h.to_bytes(5, "little")
    return None


# ---------------------------------------------------------------------------
# Sequences section encode
# ---------------------------------------------------------------------------

def _offset_values_with_reps(ll: np.ndarray, moff: np.ndarray,
                             rep: list) -> np.ndarray:
    """Map offsets to Offset_Values, using repeat-offset codes 1-3 when the
    offset matches the history (RFC 8878 3.1.1.3.2.1.1 update rules,
    mirrored from the decoder's resolve_offsets). `rep` is the frame-wide
    history, mutated in place (it persists across blocks)."""
    n = moff.size
    out = np.empty(n, dtype=np.int64)
    r0, r1, r2 = rep
    for i in range(n):
        off = int(moff[i])
        has_lit = int(ll[i]) != 0
        if has_lit:
            if off == r0:
                out[i] = 1
                continue
            if off == r1:
                out[i] = 2
                r1, r0 = r0, off
                continue
            if off == r2:
                out[i] = 3
                r2, r1, r0 = r1, r0, off
                continue
        else:
            if off == r1:
                out[i] = 1
                r1, r0 = r0, off
                continue
            if off == r2:
                out[i] = 2
                r2, r1, r0 = r1, r0, off
                continue
            if off == r0 - 1:
                out[i] = 3
                r2, r1, r0 = r1, r0, off
                continue
        out[i] = off + 3
        r2, r1, r0 = r1, r0, off
    rep[0], rep[1], rep[2] = r0, r1, r2
    return out


def _seq_count_bytes(nseq: int) -> bytes:
    if nseq < 128:
        return bytes([nseq])
    if nseq < 0x7F00:
        return bytes([128 + (nseq >> 8), nseq & 0xFF])
    return bytes([255, (nseq - 0x7F00) & 0xFF, ((nseq - 0x7F00) >> 8) & 0xFF])


def _choose_table(codes: np.ndarray, max_sym: int, max_log: int,
                  default_norm, default_log):
    """Pick (mode, header_bytes, ctable) for one code stream."""
    nseq = codes.size
    hist = np.bincount(codes, minlength=max_sym + 1)
    used = np.nonzero(hist)[0]
    if used.size == 1:
        # RLE mode
        return (seq_mod.MODE_RLE, bytes([int(used[0])]),
                _rle_ctable(int(used[0])))
    predef_ok = used[-1] < default_norm.size and np.all(
        default_norm[used] != 0)
    if nseq < 32 and predef_ok:
        ct = fse.build_ctable(default_norm, default_log)
        return seq_mod.MODE_PREDEFINED, b"", ct
    # custom table
    tl = max(5, min(max_log, (int(nseq) - 1).bit_length() - 2))
    min_tl = max(1, (int(used.size) - 1).bit_length())
    tl = max(tl, min_tl)
    tl = min(tl, max_log)
    norm = fse.normalize_counts(hist, tl, nseq, int(used[-1]))
    header = fse.write_ncount(norm, tl)
    ct = fse.build_ctable(norm, tl)
    # compare with predefined cost (approx: header size vs entropy delta)
    if predef_ok:
        pd_norm = default_norm.astype(np.float64)
        pd_p = np.where(pd_norm < 0, 0.5, pd_norm) / (1 << default_log)
        cu_p = np.where(norm < 0, 0.5, norm).astype(np.float64) / (1 << tl)
        h = hist[used].astype(np.float64)
        pd_cost = -np.sum(h * np.log2(pd_p[used]))
        cu_cost = -np.sum(h * np.log2(np.maximum(cu_p[used], 1e-9))) \
            + 8 * len(header)
        if pd_cost <= cu_cost:
            ct = fse.build_ctable(default_norm, default_log)
            return seq_mod.MODE_PREDEFINED, b"", ct
    return seq_mod.MODE_FSE, header, ct


def _rle_ctable(symbol: int):
    """Encoder-side stub for RLE mode: state emits 0 bits."""
    class _RLE:
        accuracy_log = 0

        class _Enc:
            def __init__(self):
                self.state = 0

            def encode(self, sym):
                return (0, 0)

            def flush(self):
                return (0, 0)
    return _RLE()


class _EncState:
    def __init__(self, ct, first_symbol):
        if isinstance(ct, fse.CTable):
            self.enc = fse.Encoder(ct, first_symbol)
        else:
            self.enc = ct._Enc()

    def encode(self, sym):
        return self.enc.encode(sym)

    def flush(self):
        return self.enc.flush()


def _encode_sequences(ll: np.ndarray, moff: np.ndarray,
                      ml: np.ndarray, rep: list) -> bytes:
    """Emit a Sequences_Section for matches (offset in plain form)."""
    nseq = ml.size
    out = bytearray(_seq_count_bytes(nseq))
    if nseq == 0:
        return bytes(out)

    ll_codes = seq_mod.ll_code_of(ll)
    ml_codes = seq_mod.ml_code_of(ml)
    of_values = _offset_values_with_reps(ll, moff, rep)
    of_codes = seq_mod.of_code_of(of_values)

    ll_mode, ll_hdr, ll_ct = _choose_table(
        ll_codes, seq_mod.MAX_LL_CODE, seq_mod.MAX_LL_LOG,
        seq_mod.LL_DEFAULT_NORM, seq_mod.LL_DEFAULT_LOG)
    of_mode, of_hdr, of_ct = _choose_table(
        of_codes, seq_mod.MAX_OF_CODE, seq_mod.MAX_OF_LOG,
        seq_mod.OF_DEFAULT_NORM, seq_mod.OF_DEFAULT_LOG)
    ml_mode, ml_hdr, ml_ct = _choose_table(
        ml_codes, seq_mod.MAX_ML_CODE, seq_mod.MAX_ML_LOG,
        seq_mod.ML_DEFAULT_NORM, seq_mod.ML_DEFAULT_LOG)

    out.append((ll_mode << 6) | (of_mode << 4) | (ml_mode << 2))
    out += ll_hdr
    out += of_hdr
    out += ml_hdr

    # extra-bit values
    ll_bits = seq_mod.LL_BITS[ll_codes]
    ll_extra = ll - seq_mod.LL_BASE[ll_codes]
    ml_bits = seq_mod.ML_BITS[ml_codes]
    ml_extra = ml - seq_mod.ML_BASE[ml_codes]
    of_bits = of_codes
    of_extra = of_values - (np.int64(1) << of_codes)

    pairs: list[tuple[int, int]] = []
    last = nseq - 1
    enc_ml = _EncState(ml_ct, int(ml_codes[last]))
    enc_of = _EncState(of_ct, int(of_codes[last]))
    enc_ll = _EncState(ll_ct, int(ll_codes[last]))
    pairs.append((int(ll_extra[last]), int(ll_bits[last])))
    pairs.append((int(ml_extra[last]), int(ml_bits[last])))
    pairs.append((int(of_extra[last]), int(of_bits[last])))
    for i in range(nseq - 2, -1, -1):
        pairs.append(enc_of.encode(int(of_codes[i])))
        pairs.append(enc_ml.encode(int(ml_codes[i])))
        pairs.append(enc_ll.encode(int(ll_codes[i])))
        pairs.append((int(ll_extra[i]), int(ll_bits[i])))
        pairs.append((int(ml_extra[i]), int(ml_bits[i])))
        pairs.append((int(of_extra[i]), int(of_bits[i])))
    pairs.append(enc_ml.flush())
    pairs.append(enc_of.flush())
    pairs.append(enc_ll.flush())

    vals = np.array([p[0] for p in pairs], dtype=np.uint64)
    nbs = np.array([p[1] for p in pairs], dtype=np.int64)
    out += pack_bits_lsb(vals, nbs, end_marker=True)
    return bytes(out)


# ---------------------------------------------------------------------------
# Block + frame drivers
# ---------------------------------------------------------------------------

def compress_block_body(s: np.ndarray, hashlog: int,
                        rep: list | None = None,
                        depth: int = 2) -> bytes | None:
    """Build a Compressed_Block body with an in-block-only window;
    None if expansion (caller emits raw). Standalone-block entry point —
    the frame driver uses compress_block_body_seqs with the windowed
    cross-block parse instead."""
    mpos, mlen, moff = _parse_segment(s, 0, hashlog, s.size, depth=depth)
    if rep is None:
        rep = [1, 4, 8]
    return compress_block_body_seqs(s, mpos, mlen, moff, rep)


def compress_block_body_seqs(s: np.ndarray, mpos: np.ndarray,
                             mlen: np.ndarray, moff: np.ndarray,
                             rep: list) -> bytes | None:
    """Build a Compressed_Block body from pre-found sequences (positions
    relative to the block start; offsets may reach back past it into the
    frame window). None if expansion — the caller emits a raw block and
    must leave `rep` untouched (snapshot/restore), since the decoder's
    repeat-offset history only advances on decoded sequences."""
    n = s.size
    rep_snap = list(rep)
    if mpos.size:
        lit_starts = np.concatenate([[0], mpos + mlen])
        lit_lens = np.concatenate([mpos, [n]]) - lit_starts
        ll = lit_lens[:-1]
        # literals = all bytes not covered by matches
        keep = np.ones(n, dtype=bool)
        cover_idx = _runs_to_indices(mpos, mlen)
        keep[cover_idx] = False
        lits = s[keep]
    else:
        ll = np.empty(0, dtype=np.int64)
        lits = s
    lit_sec = _encode_literals(lits)
    seq_sec = _encode_sequences(ll, moff, mlen, rep)
    body = lit_sec + seq_sec
    if len(body) >= n:
        rep[0], rep[1], rep[2] = rep_snap
        return None
    return body


def _runs_to_indices(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    base = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    within = np.arange(total) - np.repeat(base, lengths)
    return np.repeat(starts, lengths) + within


def _level_params(level: int, n: int) -> tuple[int, int, int, int]:
    """(hashlog, depth, window_log, lazy) per compression level —
    the role of the reference's ZSTD_defaultCParameters table
    (C/zstd/zstd_compress.c clampedParams); values chosen for THIS
    matcher (sorted hash chains), not copied."""
    nbits = max(10, (max(n, 1) - 1).bit_length())
    if level <= 1:
        hl, depth, wlog, lazy = 16, 1, 19, 0
    elif level <= 3:
        hl, depth, wlog, lazy = 17, 2, 21, 0
    elif level <= 6:
        hl, depth, wlog, lazy = 17, 3, 21, 1
    elif level <= 11:
        hl, depth, wlog, lazy = 18, 6, 22, 1
    elif level <= 16:
        hl, depth, wlog, lazy = 19, 10, 23, 2
    else:
        hl, depth, wlog, lazy = 20, 16, 24, 2
    return hl, depth, min(wlog, nbits), lazy


def compress(data: bytes, level: int = 3, checksum: bool = True,
             block_size: int = MAX_BLOCK_SIZE,
             window_log: int | None = None) -> bytes:
    """One-shot zstd frame compression: one windowed parse over the whole
    input (matches reach back across block boundaries up to the window),
    then per-block entropy sections."""
    if level < -7 or level > 22:
        raise ParamError(f"zstd level {level} out of range")
    s = np.frombuffer(data, dtype=np.uint8)
    n = s.size
    hashlog, depth, wlog, lazy = _level_params(level, n)
    if window_log is not None:
        if not 10 <= window_log <= 31:
            raise ParamError(f"zstd window log {window_log} out of range")
        wlog = window_log
    out = bytearray(write_frame_header(n, checksum=checksum))
    if n == 0:
        out += bytes([0x01, 0x00, 0x00])  # last, raw, size 0
    else:
        mpos, mlen, moff = find_sequences_windowed(
            s, hashlog, wlog, depth=depth, lazy=lazy)
        mpos, mlen, moff = _split_at_block_boundaries(
            mpos, mlen, moff, block_size)
        rep = [1, 4, 8]  # repeat-offset history persists across blocks
        nblocks = -(-n // block_size)
        for b in range(nblocks):
            bs = b * block_size
            chunk = s[bs:bs + block_size]
            last = 1 if b == nblocks - 1 else 0
            sel = slice(np.searchsorted(mpos, bs, "left"),
                        np.searchsorted(mpos, bs + chunk.size, "left"))
            if np.all(chunk == chunk[0]) and chunk.size >= 8:
                bh = last | (1 << 1) | (chunk.size << 3)
                out += bh.to_bytes(3, "little")
                out.append(int(chunk[0]))
                continue
            body = compress_block_body_seqs(
                chunk, mpos[sel] - bs, mlen[sel], moff[sel], rep)
            if body is None:
                bh = last | (0 << 1) | (chunk.size << 3)
                out += bh.to_bytes(3, "little")
                out += chunk.tobytes()
            else:
                bh = last | (2 << 1) | (len(body) << 3)
                out += bh.to_bytes(3, "little")
                out += body
    if checksum:
        out += (_xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)
