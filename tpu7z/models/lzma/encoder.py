"""LZMA1 encoder (fast-parse mode).

Behavioral reference: C/LzmaEnc.c (context model :364-378, fast parse
GetOptimumFast:1976, block driver LzmaEnc_CodeOneBlock:2388). Written
from the spec. The parse comes from the shared vectorized match finder
(models/lz4/block.py internals — the LzFind analog); any valid parse
decodes bit-exactly, which is what the reference's own test suite pins.

The adaptive range-coding pass is serial per stream; LZMA2 chunking
(lzma2.py) provides the parallel axis across chunks/shards.
"""

from __future__ import annotations

import numpy as np

from ...utils.errors import ParamError
from ..lz4 import block as lz4block
from .decoder import _LenProbs, _Probs
from .rangecoder import RangeEncoder


def _encode_len(rc: RangeEncoder, lp: _LenProbs, pos_state: int, length: int):
    v = length - 2
    if v < 8:
        rc.encode_bit(lp.choice, 0, 0)
        rc.encode_tree(lp.low, pos_state << 3, 3, v)
    elif v < 16:
        rc.encode_bit(lp.choice, 0, 1)
        rc.encode_bit(lp.choice, 1, 0)
        rc.encode_tree(lp.mid, pos_state << 3, 3, v - 8)
    else:
        rc.encode_bit(lp.choice, 0, 1)
        rc.encode_bit(lp.choice, 1, 1)
        rc.encode_tree(lp.high, 0, 8, v - 16)


def _pos_slot(dist: int) -> int:
    if dist < 4:
        return dist
    nd = dist.bit_length() - 1
    return (nd << 1) | ((dist >> (nd - 1)) & 1)


class LzmaEncoder:
    """Stateful LZMA1 encoder (state persists across LZMA2 chunks)."""

    def __init__(self, lc: int = 3, lp: int = 0, pb: int = 2):
        if lc > 8 or lp > 4 or pb > 4:
            raise ParamError("lzma: bad lc/lp/pb")
        self.lc, self.lp, self.pb = lc, lp, pb
        self.reset_state()

    def reset_state(self):
        self.probs = _Probs(self.lc, self.lp)
        self.state = 0
        self.reps = [0, 0, 0, 0]

    def props_byte(self) -> int:
        return (self.pb * 5 + self.lp) * 9 + self.lc

    def encode_chunk(self, window: np.ndarray, start: int, end: int,
                     matches=None, end_marker: bool = False) -> bytes:
        """Encode window[start:end]; bytes before `start` are prior
        context (dictionary). Returns the compressed chunk stream."""
        rc = RangeEncoder()
        probs = self.probs
        state = self.state
        rep0, rep1, rep2, rep3 = self.reps
        pb_mask = (1 << self.pb) - 1
        lp_mask = (1 << self.lp) - 1
        lc = self.lc

        if matches is None:
            matches = _find_matches_window(window, start, end)
        mpos, mlen, mdist = matches
        mi = 0
        nm = mpos.size

        pos = start
        while pos < end:
            while mi < nm and mpos[mi] < pos:
                mi += 1
            pos_state = pos & pb_mask
            take_match = mi < nm and mpos[mi] == pos
            if take_match:
                length = int(mlen[mi])
                dist = int(mdist[mi])  # distance-1 form
                length = min(length, end - pos)
                if length < 2:
                    take_match = False
            if not take_match:
                # literal
                rc.encode_bit(probs.is_match, (state << 4) + pos_state, 0)
                prev = int(window[pos - 1]) if pos > 0 else 0
                lit_state = ((pos & lp_mask) << lc) + (prev >> (8 - lc))
                base = 0x300 * lit_state
                lit = probs.literal
                sym = int(window[pos])
                if state < 7:
                    ctx = 1
                    for i in range(7, -1, -1):
                        b = (sym >> i) & 1
                        rc.encode_bit(lit, base + ctx, b)
                        ctx = (ctx << 1) | b
                else:
                    match_byte = int(window[pos - rep0 - 1])
                    ctx = 1
                    i = 7
                    while i >= 0:
                        b = (sym >> i) & 1
                        match_bit = (match_byte >> i) & 1
                        rc.encode_bit(
                            lit, base + ((1 + match_bit) << 8) + ctx, b)
                        ctx = (ctx << 1) | b
                        i -= 1
                        if match_bit != b:
                            while i >= 0:
                                b = (sym >> i) & 1
                                rc.encode_bit(lit, base + ctx, b)
                                ctx = (ctx << 1) | b
                                i -= 1
                            break
                state = (0 if state < 4 else state - 3 if state < 10
                         else state - 6)
                pos += 1
                continue

            rc.encode_bit(probs.is_match, (state << 4) + pos_state, 1)
            if dist == rep0:
                # rep0 match
                rc.encode_bit(probs.is_rep, state, 1)
                rc.encode_bit(probs.is_rep_g0, state, 0)
                if length == 1:
                    rc.encode_bit(probs.is_rep0_long,
                                  (state << 4) + pos_state, 0)
                    state = 9 if state < 7 else 11
                    pos += 1
                    continue
                rc.encode_bit(probs.is_rep0_long,
                              (state << 4) + pos_state, 1)
                _encode_len(rc, probs.rep_len_coder, pos_state, length)
                state = 8 if state < 7 else 11
            elif dist in (rep1, rep2, rep3):
                rc.encode_bit(probs.is_rep, state, 1)
                rc.encode_bit(probs.is_rep_g0, state, 1)
                if dist == rep1:
                    rc.encode_bit(probs.is_rep_g1, state, 0)
                else:
                    rc.encode_bit(probs.is_rep_g1, state, 1)
                    if dist == rep2:
                        rc.encode_bit(probs.is_rep_g2, state, 0)
                    else:
                        rc.encode_bit(probs.is_rep_g2, state, 1)
                        rep3 = rep2
                    rep2 = rep1
                rep1 = rep0
                rep0 = dist
                _encode_len(rc, probs.rep_len_coder, pos_state, length)
                state = 8 if state < 7 else 11
            else:
                # new match
                rc.encode_bit(probs.is_rep, state, 0)
                rep3, rep2, rep1 = rep2, rep1, rep0
                rep0 = dist
                _encode_len(rc, probs.len_coder, pos_state, length)
                state = 7 if state < 7 else 10
                len_state = min(length - 2, 3)
                slot = _pos_slot(dist)
                rc.encode_tree(probs.pos_slot, len_state << 6, 6, slot)
                if slot >= 4:
                    nd = (slot >> 1) - 1
                    base_v = (2 | (slot & 1)) << nd
                    rem = dist - base_v
                    if slot < 14:
                        rc.encode_tree_reverse(probs.spec_pos,
                                               base_v - slot - 1, nd, rem)
                    else:
                        rc.encode_direct(rem >> 4, nd - 4)
                        rc.encode_tree_reverse(probs.align, 0, 4, rem & 15)
            pos += length

        if end_marker:
            pos_state = pos & pb_mask
            rc.encode_bit(probs.is_match, (state << 4) + pos_state, 1)
            rc.encode_bit(probs.is_rep, state, 0)
            _encode_len(rc, probs.len_coder, pos_state, 2)
            slot = 63
            rc.encode_tree(probs.pos_slot, 0, 6, slot)
            nd = (slot >> 1) - 1
            base_v = (2 | (slot & 1)) << nd
            rem = 0xFFFFFFFF - base_v
            rc.encode_direct(rem >> 4, nd - 4)
            rc.encode_tree_reverse(probs.align, 0, 4, rem & 15)
            state = 7 if state < 7 else 10

        self.probs = probs
        self.state = state
        self.reps = [rep0, rep1, rep2, rep3]
        return rc.flush()


def _find_matches_window(window: np.ndarray, start: int, end: int,
                         hashlog: int = 16):
    """Greedy matches for window[start:end] (may reference bytes before
    start). Returns (mpos, mlen, mdist) with dist in distance-1 form."""
    n = end
    s = window[:end]
    if end - start < 16 or end < 16:
        return (np.empty(0, np.int64),) * 3
    cand = lz4block._find_candidates(s, hashlog=hashlog)
    pos_all = np.arange(cand.size, dtype=np.int64)
    valid = (cand >= 0) & (pos_all >= start) & (pos_all <= n - 8)
    limit = np.zeros(cand.size, dtype=np.int64)
    limit[valid] = np.minimum(n - pos_all[valid], 273)
    mlen = np.zeros(cand.size, dtype=np.int64)
    vidx = np.where(valid)[0]
    if vidx.size:
        mlen[vidx] = lz4block._match_lengths(s, pos_all[vidx], cand[vidx],
                                             limit[vidx])
    valid &= mlen >= 4
    nxt = np.where(valid, pos_all + mlen, pos_all + 1)
    full_next = np.full(n, n, dtype=np.int64)
    full_next[: nxt.size] = nxt
    full_next[:start] = 0  # parse starts at `start`
    visited = _parse_from(full_next, start, n)
    is_match = np.zeros(n, dtype=bool)
    vm = np.zeros(n, dtype=np.int64)
    vd = np.zeros(n, dtype=np.int64)
    is_match[: valid.size] = valid
    vm[: mlen.size] = mlen
    vd[: cand.size] = pos_all - cand - 1
    m_sel = visited[is_match[visited]]
    return m_sel, vm[m_sel], vd[m_sel]


def _parse_from(next_pos: np.ndarray, start: int, n: int) -> np.ndarray:
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


def compress_raw(data: bytes, lc: int = 3, lp: int = 0, pb: int = 2,
                 end_marker: bool = False) -> tuple[bytes, bytes]:
    """Raw LZMA1 stream. Returns (stream, props5). Hot path: the native
    optimal-parse encoder (native/src/lzma_enc.cpp); Python fallback."""
    if not end_marker:
        from ... import native
        nat = native.lzma_raw_encode(data, lc=lc, lp=lp, pb=pb)
        if nat is not None:
            stream, _props = nat
            dict_size = max(1 << 16,
                            1 << (max(1, len(data) - 1).bit_length()))
            props = bytes([(pb * 5 + lp) * 9 + lc]) \
                + dict_size.to_bytes(4, "little")
            return stream, props
    enc = LzmaEncoder(lc, lp, pb)
    window = np.frombuffer(data, dtype=np.uint8)
    stream = enc.encode_chunk(window, 0, window.size, end_marker=end_marker)
    dict_size = max(1 << 16, 1 << (max(1, window.size - 1)).bit_length())
    props = bytes([enc.props_byte()]) + dict_size.to_bytes(4, "little")
    return stream, props


def compress_alone(data: bytes, lc: int = 3, lp: int = 0,
                   pb: int = 2) -> bytes:
    stream, props = compress_raw(data, lc, lp, pb)
    return props + len(data).to_bytes(8, "little") + stream
