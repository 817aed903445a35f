"""Brotli encoder (RFC 7932).

Qualities 0-1 emit uncompressed meta-blocks (fast store path). Qualities
2-11 emit entropy-coded meta-blocks: LZ77 parse via the shared vectorized
hash-chain matcher (the same batch matcher the zstd encoder uses — the
TPU-friendly replacement for the reference's hash-to-binary-tree finders,
C/brotli/br_backward_references.c behavior), one command/literal/distance
Huffman code set per meta-block with the RFC 3.5 complex prefix-code
serialization, and the RFC 4 distance ring buffer.

compress_mt_container wraps frames in the zstdmt "BR" skippable container
the reference's 7z brotli coder emits (C/zstdmt/brotli-mt_compress.c:301).
"""

from __future__ import annotations

import numpy as np

from .decoder import (INSERT_BASE, INSERT_EXTRA, COPY_BASE, COPY_EXTRA,
                      _CMD_CELLS, _CONTEXT_LUT)

_CTX_LUT = np.frombuffer(_CONTEXT_LUT, np.uint8)

# cell lookup: (insert_offset, copy_offset, implicit_dist0) -> cmd>>6
_CELL_IDX = {cell: i for i, cell in enumerate(_CMD_CELLS)}

_INS_BASE = np.asarray(INSERT_BASE, np.int64)
_CPY_BASE = np.asarray(COPY_BASE, np.int64)

# static code-length-code: value -> (lsb-first bits, nbits)
# (inverse of the decoder's 4-bit peek table, decoder.py:53-54)
_CL_STATIC = {0: (0, 2), 1: (7, 4), 2: (3, 3), 3: (2, 2), 4: (1, 2),
              5: (15, 4)}
_CL_ORDER = (1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)


class _BitSink:
    """Accumulates (value, nbits) pairs; packs LSB-first at close.

    Vectorized twin of a serial bit writer: emission order is the pair
    order, each value's bits are written LSB-first (the zstd/brotli
    convention)."""

    __slots__ = ("vals", "bits")

    def __init__(self):
        self.vals = []
        self.bits = []

    def put(self, value: int, nbits: int):
        if nbits:
            self.vals.append(np.int64(value))
            self.bits.append(np.int64(nbits))

    def put_arrays(self, vals: np.ndarray, bits: np.ndarray):
        self.vals.append(np.asarray(vals, np.int64))
        self.bits.append(np.asarray(bits, np.int64))

    def bit_length(self) -> int:
        return int(sum(int(np.sum(b)) for b in self.bits))

    def align(self):
        pad = (-self.bit_length()) % 8
        if pad:
            self.put(0, pad)

    def raw(self, data: bytes):
        self.align()
        if data:
            arr = np.frombuffer(data, np.uint8).astype(np.int64)
            self.put_arrays(arr, np.full(arr.size, 8, np.int64))

    def extend(self, other: "_BitSink"):
        self.vals.extend(other.vals)
        self.bits.extend(other.bits)

    def close(self) -> bytes:
        if not self.vals:
            return b""
        vals = np.concatenate([np.atleast_1d(v) for v in self.vals])
        bits = np.concatenate([np.atleast_1d(b) for b in self.bits])
        total = int(bits.sum())
        offs = np.concatenate([[0], np.cumsum(bits)])[:-1]
        idx_within = np.arange(total, dtype=np.int64) - np.repeat(offs, bits)
        vals_rep = np.repeat(vals, bits)
        flat = ((vals_rep >> idx_within) & 1).astype(np.uint8)
        return np.packbits(flat, bitorder="little").tobytes()


# ------------------------------------------------------ prefix codes ---

def _huffman_lengths(freqs: np.ndarray, max_bits: int = 15) -> np.ndarray:
    """Optimal length-limited code lengths (0 = unused symbol)."""
    from ..zstd.huffman import _package_merge

    used = np.flatnonzero(freqs)
    lengths = np.zeros(freqs.size, np.int64)
    if used.size == 0:
        return lengths
    if used.size == 1:
        lengths[used[0]] = 1
        return lengths
    sub = _package_merge(freqs[used].astype(np.int64), max_bits)
    lengths[used] = sub
    return lengths


def _canonical_rev(lengths: np.ndarray):
    """Canonical codes matching the decoder's (len, sym) ordering
    (decoder.py:_Huff), bit-reversed so an LSB-first write emits the
    code MSB-first."""
    codes = np.zeros(lengths.size, np.int64)
    pairs = sorted((int(l), s) for s, l in enumerate(lengths) if l > 0)
    code = 0
    prev = 0
    for ln, sym in pairs:
        code <<= (ln - prev)
        prev = ln
        rev = int(f"{code:0{ln}b}"[::-1], 2)
        codes[sym] = rev
        code += 1
    return codes


def _rle_digits(run: int, base: int):
    """Digit expansion for repeat codes 16 (base 4) / 17 (base 8):
    offsets o1=3, o_k = base*o_{k-1} - (2*base-3); the k-digit range is
    [o_k, o_k + base^k - 1], contiguous, so greedy fit is exact."""
    offsets = [3]
    while offsets[-1] + base ** len(offsets) - 1 < run:
        offsets.append(base * offsets[-1] - (2 * base - 3))
    k = len(offsets)
    d = run - offsets[-1]
    digits = []
    for i in range(k):
        digits.append(d % base)
        d //= base
    return digits[::-1]


def _length_seq(lengths: np.ndarray):
    """Code-length sequence with RLE 16/17, up to last nonzero symbol.
    Yields (clsym, extra_value, extra_bits)."""
    nz = np.flatnonzero(lengths)
    if nz.size == 0:
        return []
    out = []
    end = int(nz[-1]) + 1
    i = 0
    ls = lengths[:end]
    prev_nonzero = 8
    while i < end:
        v = int(ls[i])
        run = 1
        while i + run < end and int(ls[i + run]) == v:
            run += 1
        if v == 0:
            if run < 3:
                out.extend([(0, 0, 0)] * run)
            else:
                for d in _rle_digits(run, 8):
                    out.append((17, d, 3))
        else:
            rep = run
            if v == prev_nonzero:
                first = 0
            else:
                out.append((v, 0, 0))
                first = 1
            rep = run - first
            if rep:
                if rep < 3:
                    out.extend([(v, 0, 0)] * rep)
                else:
                    for d in _rle_digits(rep, 4):
                        out.append((16, d, 2))
            prev_nonzero = v
        i += run
    return out


def _emit_prefix_code(sink: _BitSink, lengths: np.ndarray,
                      freqs: np.ndarray, alphabet_size: int) -> np.ndarray:
    """Serialize one prefix code (RFC 7932 3.4/3.5). Returns the
    *effective* code lengths the decoder will reconstruct — for the
    simple-code path these follow the fixed tree shapes of
    decoder.py:146-173, not the optimal lengths."""
    used = np.flatnonzero(lengths)
    nbits_sym = max(1, (alphabet_size - 1).bit_length())
    if used.size <= 4:
        # simple code (hskip = 1)
        sink.put(1, 2)
        eff = np.zeros(alphabet_size, np.int64)
        if used.size == 0:
            sink.put(0, 2)       # NSYM = 1
            sink.put(0, nbits_sym)
            return eff
        syms = sorted(int(s) for s in used)
        # most frequent first: gets the shortest code in the 3/4-symbol
        # tree shapes the decoder builds (decoder.py:163-173)
        syms.sort(key=lambda s: -int(freqs[s]))
        nsym = len(syms)
        sink.put(nsym - 1, 2)
        if nsym == 1:
            sink.put(syms[0], nbits_sym)
            # zero-bit code: eff stays 0
        elif nsym == 2:
            for s in syms:
                sink.put(s, nbits_sym)
            eff[syms] = 1
        elif nsym == 3:
            for s in syms:
                sink.put(s, nbits_sym)
            eff[syms[0]] = 1
            eff[syms[1]] = eff[syms[2]] = 2
        else:
            # tree-select: skewed [1,2,3,3] vs flat [2,2,2,2]
            f = [int(freqs[s]) for s in syms]
            skew_cost = f[0] + 2 * f[1] + 3 * (f[2] + f[3])
            flat_cost = 2 * sum(f)
            tree = 1 if skew_cost < flat_cost else 0
            for s in syms:
                sink.put(s, nbits_sym)
            sink.put(tree, 1)
            if tree:
                eff[syms[0]] = 1
                eff[syms[1]] = 2
                eff[syms[2]] = eff[syms[3]] = 3
            else:
                eff[syms] = 2
        return eff

    # complex code (hskip = 0)
    sink.put(0, 2)
    seq = _length_seq(lengths)
    cl_freqs = np.zeros(18, np.int64)
    for c, _e, _n in seq:
        cl_freqs[c] += 1
    cl_lens = _huffman_lengths(cl_freqs, max_bits=5)
    cl_codes = _canonical_rev(cl_lens)
    # code-length-code lengths in _CL_ORDER; decoder stops once the
    # 32-unit space fills, or reads all 18 entries (single-code case)
    nz_cl = int(np.count_nonzero(cl_lens))
    space = 32
    for idx in _CL_ORDER:
        v = int(cl_lens[idx])
        bits, n = _CL_STATIC[v]
        sink.put(bits, n)
        if v:
            space -= 32 >> v
            if space <= 0 and nz_cl > 1:
                break
    for c, extra, nb in seq:
        if nz_cl > 1:
            sink.put(int(cl_codes[c]), int(cl_lens[c]))
        sink.put(extra, nb)
    return lengths


# --------------------------------------------------------- LZ77 parse ---

def _find_matches(data: bytes, quality: int, window_size: int,
                  mb_size: int):
    from ..zstd import compressor as zc

    s = np.frombuffer(data, np.uint8)
    n = s.size
    if quality <= 4:
        hashlog, depth, lazy = 15, 1, 0
    elif quality <= 8:
        hashlog, depth, lazy = 16, 4, 1
    else:
        hashlog, depth, lazy = 17, 16, 2
    wlog = max(10, min(24, (max(2, n - 1)).bit_length()))
    mpos, mlen, moff = zc.find_sequences_windowed(
        s, hashlog, wlog, depth=depth, lazy=lazy)
    # brotli's max back-reference distance is window_size, 16 less than
    # the matcher's power-of-two window
    keep = moff <= window_size
    mpos, mlen, moff = mpos[keep], mlen[keep], moff[keep]
    mpos, mlen, moff = zc._split_at_block_boundaries(mpos, mlen, moff,
                                                     mb_size)
    order = np.argsort(mpos, kind="stable")
    return mpos[order], mlen[order], moff[order]


def _dist_code(dist: int, ring: list, ridx: int):
    """Smallest distance code for `dist` given the ring state
    (decoder.py:489-513 inverted, npostfix=0 ndirect=0)."""
    last = ring[(ridx + 3) & 3]
    if dist == last:
        return 0, 0, 0
    if dist == ring[(ridx + 2) & 3]:
        return 1, 0, 0
    if dist == ring[(ridx + 1) & 3]:
        return 2, 0, 0
    if dist == ring[ridx & 3]:
        return 3, 0, 0
    second = ring[(ridx + 2) & 3]
    for dc in range(4, 16):
        base = last if dc < 10 else second
        k = dc - 4 if dc < 10 else dc - 10
        off = 1 + (k >> 1)
        cand = base + off if (k & 1) else base - off
        if cand == dist and cand > 0:
            return dc, 0, 0
    val = dist + 3
    nb = val.bit_length() - 2
    prefix = val >> nb
    hcode = 2 * (nb - 1) + (prefix & 1)
    extra = val & ((1 << nb) - 1)
    return 16 + hcode, extra, nb


def _code_of(base_table: np.ndarray, v: int) -> int:
    return int(np.searchsorted(base_table, v, side="right")) - 1


def _entropy_bits(h):
    tot = h.sum()
    if tot == 0:
        return 0.0
    nz = h[h > 0].astype(np.float64)
    return float((nz * (np.log2(tot) - np.log2(nz))).sum())


def _cluster_contexts(hist64, max_trees=6):
    """Greedy pairwise merge of 64 per-context literal histograms into
    <= max_trees clusters, stopping early when merging stops paying
    (the reference's HistogramCombine idea, br_cluster.c, re-derived
    as plain entropy-delta greedy merging). Returns (cmap64, ntrees,
    cluster_hists)."""
    hists = [hist64[c].copy() for c in range(64)]
    members = [[c] for c in range(64)]
    costs = [_entropy_bits(h) for h in hists]
    # drop empty contexts into cluster 0 upfront
    live = [i for i in range(64) if hists[i].sum() > 0] or [0]
    dead = [i for i in range(64) if hists[i].sum() == 0 and i != live[0]]
    for i in dead:
        members[live[0]].extend(members[i])
    hists = [hists[i] for i in live]
    members = [members[i] for i in live]
    costs = [costs[i] for i in live]
    TABLE_BITS = 350.0  # rough serialized-table cost per extra tree
    while len(hists) > 1:
        best = None
        for i in range(len(hists)):
            for j in range(i + 1, len(hists)):
                d = _entropy_bits(hists[i] + hists[j]) \
                    - costs[i] - costs[j]
                if best is None or d < best[0]:
                    best = (d, i, j)
        d, i, j = best
        if len(hists) <= max_trees and d > TABLE_BITS:
            break
        hists[i] = hists[i] + hists[j]
        costs[i] = _entropy_bits(hists[i])
        members[i].extend(members[j])
        del hists[j], members[j], costs[j]
    cmap = [0] * 64
    for t, mem in enumerate(members):
        for c in mem:
            cmap[c] = t
    return cmap, len(hists), hists


def _put_varlen_uint8(sink, v: int):
    """Inverse of decoder._read_varlen_uint8."""
    if v == 0:
        sink.put(0, 1)
        return
    sink.put(1, 1)
    if v == 1:
        sink.put(0, 3)
        return
    n = v.bit_length() - 1
    sink.put(n, 3)
    sink.put(v - (1 << n), n)


def _encode_metablock(data: bytes, a: int, b: int, seqs, ring: list,
                      quality: int = 9):
    """Build one compressed meta-block body into a fresh sink.
    Mutates `ring` (committed only if the caller keeps this body)."""
    sink = _BitSink()
    s = np.frombuffer(data, np.uint8)
    mpos, mlen, moff = seqs
    mlen_mb = b - a

    # ---- pass 1: commands + histograms
    lit_freq = np.zeros(256, np.int64)
    cmd_freq = np.zeros(704, np.int64)
    dst_freq = np.zeros(64, np.int64)
    cmds = []  # (cmd_sym, il_extra, il_nb, lit_lo, lit_hi, cl_extra,
    #            cl_nb, dsym_or_-1, d_extra, d_nb)
    pos = a
    for i in range(mpos.size):
        p, l, o = int(mpos[i]), int(mlen[i]), int(moff[i])
        ilen = p - pos
        dcode, d_extra, d_nb = _dist_code(o, ring, ring[4])
        ins_code = _code_of(_INS_BASE, ilen)
        cpy_code = _code_of(_CPY_BASE, l)
        implicit = (dcode == 0 and ins_code < 8 and cpy_code < 16)
        io = 16 if ins_code >= 16 else (8 if ins_code >= 8 else 0)
        co = 16 if cpy_code >= 16 else (8 if cpy_code >= 8 else 0)
        cell = _CELL_IDX[(io, co, implicit)]
        sym = (cell << 6) | ((ins_code - io) << 3) | (cpy_code - co)
        cmd_freq[sym] += 1
        if implicit:
            dsym = -1
        else:
            dsym = dcode
            dst_freq[dcode] += 1
            if dcode != 0:
                ring[ring[4] & 3] = o
                ring[4] = (ring[4] + 1) & 3
        il_extra = ilen - INSERT_BASE[ins_code]
        cl_extra = l - COPY_BASE[cpy_code]
        cmds.append((sym, il_extra, INSERT_EXTRA[ins_code], pos, p,
                     cl_extra, COPY_EXTRA[cpy_code], dsym, d_extra, d_nb))
        pos = p + l
    if pos < b:
        ilen = b - pos
        ins_code = _code_of(_INS_BASE, ilen)
        io = 16 if ins_code >= 16 else (8 if ins_code >= 8 else 0)
        cell = _CELL_IDX[(io, 0, io == 0)]
        sym = (cell << 6) | ((ins_code - io) << 3)
        cmd_freq[sym] += 1
        cmds.append((sym, ilen - INSERT_BASE[ins_code],
                     INSERT_EXTRA[ins_code], pos, b, 0, 0, -1, 0, 0))
    lit_mask = np.zeros(mlen_mb, bool)
    for (_s, _ie, _in_, lo, hi, *_rest) in cmds:
        lit_mask[lo - a:hi - a] = True
    lit_bytes = s[a:b][lit_mask]
    np.add.at(lit_freq, lit_bytes, 1)

    # ---- literal context modeling (quality >= 10): per-literal UTF8
    # context (RFC 7932 7.1) clusters into a few trees; the context map
    # routes each literal to its tree (reference: br_encode.c context
    # modeling, re-derived via entropy clustering)
    lit_pos = np.nonzero(lit_mask)[0] + a
    use_ctx = quality >= 10 and lit_pos.size > 4096
    tree_of = None
    ntrees = 1
    if use_ctx:
        p1 = np.where(lit_pos >= 1, s[np.maximum(lit_pos - 1, 0)], 0)
        p2 = np.where(lit_pos >= 2, s[np.maximum(lit_pos - 2, 0)], 0)
        ctx = (_CTX_LUT[1024 + p1.astype(np.int64)]
               | _CTX_LUT[1280 + p2.astype(np.int64)]).astype(np.int64)
        hist64 = np.zeros((64, 256), np.int64)
        np.add.at(hist64, (ctx, lit_bytes.astype(np.int64)), 1)
        cmap, ntrees, cl_hists = _cluster_contexts(hist64)
        if ntrees > 1:
            cmap_arr = np.asarray(cmap, np.int64)
            tree_full = np.zeros(mlen_mb, np.uint8)
            tree_full[lit_pos - a] = cmap_arr[ctx].astype(np.uint8)
        else:
            use_ctx = False

    # ---- code tables
    cmd_lens = _huffman_lengths(cmd_freq)
    dst_lens = _huffman_lengths(dst_freq)

    # ---- header: single block type per category
    for _cat in range(3):
        sink.put(0, 1)       # NBLTYPES = 1 (varlen-uint8 zero)
    sink.put(0, 2)           # NPOSTFIX = 0
    sink.put(0, 4)           # NDIRECT = 0
    if use_ctx:
        sink.put(2, 2)       # literal context mode: UTF8
        _put_varlen_uint8(sink, ntrees - 1)   # NTREESL
        # context map: no RLE, direct symbols, no IMTF
        sink.put(0, 1)       # use_rle = 0
        cm_freq = np.zeros(ntrees, np.int64)
        np.add.at(cm_freq, np.asarray(cmap, np.int64), 1)
        cm_lens = _huffman_lengths(cm_freq)
        cm_elens = _emit_prefix_code(sink, cm_lens, cm_freq, ntrees)
        cm_codes = _canonical_rev(cm_elens)
        for v in cmap:
            sink.put(int(cm_codes[v]), int(cm_elens[v]))
        sink.put(0, 1)       # IMTF = 0
    else:
        sink.put(0, 2)       # literal context mode (irrelevant, 1 tree)
        sink.put(0, 1)       # NTREESL = 1
    sink.put(0, 1)           # NTREESD = 1
    if use_ctx:
        elens2d = np.zeros((ntrees, 256), np.int64)
        codes2d = np.zeros((ntrees, 256), np.int64)
        for t in range(ntrees):
            hl = _huffman_lengths(cl_hists[t])
            el = _emit_prefix_code(sink, hl, cl_hists[t], 256)
            elens2d[t] = el
            codes2d[t] = _canonical_rev(el)
    else:
        lit_lens = _huffman_lengths(lit_freq)
        lit_elens = _emit_prefix_code(sink, lit_lens, lit_freq, 256)
        lit_codes = _canonical_rev(lit_elens)
    cmd_elens = _emit_prefix_code(sink, cmd_lens, cmd_freq, 704)
    dst_elens = _emit_prefix_code(sink, dst_lens, dst_freq, 64)
    cmd_codes = _canonical_rev(cmd_elens)
    dst_codes = _canonical_rev(dst_elens)

    # ---- body (vectorized literal runs between command symbols)
    for (sym, il_extra, il_nb, lo, hi, cl_extra, cl_nb, dsym, d_extra,
         d_nb) in cmds:
        sink.put(int(cmd_codes[sym]), int(cmd_elens[sym]))
        sink.put(il_extra, il_nb)
        sink.put(cl_extra, cl_nb)
        if hi > lo:
            run = s[lo:hi]
            if use_ctx:
                tr = tree_full[lo - a:hi - a]
                sink.put_arrays(codes2d[tr, run], elens2d[tr, run])
            else:
                sink.put_arrays(lit_codes[run], lit_elens[run])
        if dsym >= 0:
            sink.put(int(dst_codes[dsym]), int(dst_elens[dsym]))
            sink.put(d_extra, d_nb)
    return sink


# ------------------------------------------------------------ driver ---

def compress(data: bytes, quality: int = 9) -> bytes:
    n = len(data)
    sink = _BitSink()
    # window bits (decoder.py:377-391 header encoding)
    if quality <= 1 or n == 0:
        wbits = 16
    else:
        wbits = max(10, min(24, (n + 16).bit_length()))
    if wbits == 16:
        sink.put(0, 1)
    elif wbits == 17:
        sink.put(1, 1)
        sink.put(0, 3)
        sink.put(0, 3)
    elif wbits > 17:
        sink.put(1, 1)
        sink.put(wbits - 17, 3)
    else:
        sink.put(1, 1)
        sink.put(0, 3)
        sink.put(wbits - 8, 3)
    window_size = (1 << wbits) - 16

    mb_size = 1 << 22
    if quality >= 2 and n:
        seqs = _find_matches(data, quality, window_size, mb_size)
    else:
        seqs = (np.empty(0, np.int64),) * 3
    ring = [16, 15, 11, 4, 0]

    pos = 0
    while pos < n:
        b = min(pos + mb_size, n)
        chunk_len = b - pos
        body = None
        if quality >= 2:
            mp, ml, mo = seqs
            in_mb = (mp >= pos) & (mp < b)
            ring_snap = list(ring)
            body = _encode_metablock(data, pos, b,
                                     (mp[in_mb], ml[in_mb], mo[in_mb]),
                                     ring, quality=quality)
            if (body.bit_length() + 7) // 8 >= chunk_len + 4:
                ring[:] = ring_snap
                body = None
        sink.put(0, 1)       # ISLAST = 0
        mlen1 = chunk_len - 1
        if mlen1 < (1 << 16):
            sink.put(0, 2)
            sink.put(mlen1, 16)
        elif mlen1 < (1 << 20):
            sink.put(1, 2)
            sink.put(mlen1, 20)
        else:
            sink.put(2, 2)
            sink.put(mlen1, 24)
        if body is None:
            sink.put(1, 1)   # ISUNCOMPRESSED
            sink.raw(data[pos:b])
        else:
            sink.put(0, 1)
            sink.extend(body)
        pos = b
    sink.put(1, 1)  # ISLAST
    sink.put(1, 1)  # ISLASTEMPTY
    return sink.close()


def compress_mt_container(data: bytes, quality: int = 9) -> bytes:
    stream = compress(data, quality)
    hdr = bytearray()
    hdr += (0x184D2A50).to_bytes(4, "little")
    hdr += (8).to_bytes(4, "little")
    hdr += len(stream).to_bytes(4, "little")
    hdr += b"BR"
    hint = min(0xFFFF, (len(data) >> 16) + (1 if len(data) & 0xFFFF else 0))
    hdr += hint.to_bytes(2, "little")
    return bytes(hdr) + stream
