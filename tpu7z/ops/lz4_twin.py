"""Numpy twin of the fused Pallas LZ4 encode kernel (ops/lz4_pallas.py).

This file IS the specification: it implements, step by step and with the
same data layout, the algorithm the Pallas kernel runs on the TPU. The
kernel is tested cell-for-cell against this twin; the twin's output is
tested to round-trip through the LZ4 block decoder and the reference
binary.

Algorithm (TPU-first redesign of C/lz4/lz4.c:LZ4_compress_generic — the
reference walks a hash table byte-serially; we replace that with
fixed-shape vector phases so every step maps onto VPU/MXU ops):

  phase 0  words/hashes/small-offset runs     (elementwise, outside kernel)
  phase 1  bucketed previous-occurrence match finding: 512 sequential
           minitiles of 128 positions; per bucket a (64,64) table holds
           last solo occurrence + two f32 check words (exact 4-byte
           verify). All table ops are factored one-hot matmuls.
  phase 2  match lengths from candidate diagonals + small-offset runs
           (suffix run-length via log-shift doubling; no gathers)
  phase 3  per-row (128-byte lane) greedy parse, 512 rows in parallel;
           matches capped at row end; same-offset chains re-merged
           across rows so long runs still emit one long match
  phase 4  destination computation via prefix sums (keep mask + header
           injection sizes)
  phase 5  emission: literal plane + 5 structural header bytes per slot
           scattered by factored one-hot matmuls; LSIC 255-runs as
           range fills

Blocks whose longest literal run exceeds HUGE_RUN are flagged for the
host fallback encoder (they are near-incompressible stretches; the
kernel's header-stream budget is sized for runs below this).
"""

from __future__ import annotations

import numpy as np

MIN_MATCH = 4
ROW = 128            # lane width: one parse lane per 128-byte row
NROWS = 512          # rows per 64KB block
BLOCK = ROW * NROWS
NBUCKET_LO = 64
NBUCKET_HI = 64
HASH_BITS = 12
MAX_SLOTS = 32       # max matches per row (min match span is 4 bytes)
HUGE_RUN = 8192      # literal runs >= this flag the block for host fallback
TAIL_GUARD = 12      # last match must start before len-TAIL_GUARD (lz4.h)
END_LITERALS = 5     # last 5 bytes are always literals
SMALL_OFFS = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128)

HASH_MULT = np.uint32(2654435761)


def phase0(block: np.ndarray, n: int):
    """block: (BLOCK,) uint8 zero-padded. Returns dict of planes."""
    u = block.astype(np.uint32)
    v = (u
         | (np.roll(u, -1) << 8)
         | (np.roll(u, -2) << 16)
         | (np.roll(u, -3) << 24))
    h = ((v * HASH_MULT) >> np.uint32(32 - HASH_BITS)).astype(np.int32)
    hlo = h & (NBUCKET_LO - 1)
    hhi = h >> 6
    chk_lo = (v & 0xFFFF).astype(np.float32)
    chk_hi = (v >> 16).astype(np.float32)

    pos = np.arange(BLOCK, dtype=np.int32)
    matchable = pos < max(n - TAIL_GUARD, 0)

    # small-offset candidates: nearest offset with a 4-byte word match
    so_off = np.zeros(BLOCK, np.int32)
    for o in SMALL_OFFS:
        eq = np.zeros(BLOCK, bool)
        eq[o:] = v[o:] == v[:-o]
        hit = eq & (so_off == 0)
        so_off[hit] = o
    so_off = np.where(matchable, so_off, 0)

    return dict(v=v, hlo=hlo, hhi=hhi, chk_lo=chk_lo, chk_hi=chk_hi,
                so_off=so_off, matchable=matchable)


def phase1_matcher(p0):
    """Bucketed previous-occurrence candidates, minitile-sequential.

    Returns cand: (BLOCK,) int32, -1 = none. cand[i] < i always, and
    the 4-byte words at cand[i] and i are EXACTLY equal (two f32 check
    words make the 32-bit compare exact)."""
    hlo, hhi = p0["hlo"], p0["hhi"]
    chk_lo, chk_hi = p0["chk_lo"], p0["chk_hi"]
    matchable = p0["matchable"]

    Lpos = np.zeros((NBUCKET_LO, NBUCKET_HI), np.float32)  # pos+1, 0=none
    Lclo = np.zeros((NBUCKET_LO, NBUCKET_HI), np.float32)
    Lchi = np.zeros((NBUCKET_LO, NBUCKET_HI), np.float32)
    cand = np.full(BLOCK, -1, np.int32)

    for t in range(NROWS):
        s = t * ROW
        lo = hlo[s:s + ROW]
        hi = hhi[s:s + ROW]
        cl = chk_lo[s:s + ROW]
        ch = chk_hi[s:s + ROW]

        # gather candidate + checks for each lane
        g = Lpos[lo, hi]
        gcl = Lclo[lo, hi]
        gch = Lchi[lo, hi]
        ok = (g > 0) & (gcl == cl) & (gch == ch) & matchable[s:s + ROW]
        cand[s:s + ROW] = np.where(ok, g.astype(np.int32) - 1, -1)

        # update tables: per (lo,hi) cell, if exactly one lane of this
        # minitile hashes there, it becomes the new entry. The kernel
        # computes cnt/idxsum/clsum/chsum with one-hot matmuls; bincount
        # is the numpy equivalent (identical arithmetic: sums of
        # disjoint one-hot rows).
        flat = (lo * NBUCKET_HI + hi).astype(np.int64)
        ncell = NBUCKET_LO * NBUCKET_HI
        w = np.arange(ROW, dtype=np.float32) + s
        cnt = np.bincount(flat, minlength=ncell).reshape(64, 64)
        idxsum = np.bincount(flat, weights=w,
                             minlength=ncell).reshape(64, 64)
        clsum = np.bincount(flat, weights=cl.astype(np.float64),
                            minlength=ncell).reshape(64, 64)
        chsum = np.bincount(flat, weights=ch.astype(np.float64),
                            minlength=ncell).reshape(64, 64)
        upd = cnt == 1
        Lpos = np.where(upd, idxsum.astype(np.float32) + 1.0, Lpos)
        Lclo = np.where(upd, clsum.astype(np.float32), Lclo)
        Lchi = np.where(upd, chsum.astype(np.float32), Lchi)
    return cand


def _suffix_run(flag: np.ndarray, cap: int) -> np.ndarray:
    """run[i] = number of consecutive True at i, i+1, ... (capped).

    Log-doubling with shifts only (kernel uses flat rolls)."""
    run = flag.astype(np.int32)
    step = 1
    while step < cap:
        shifted = np.zeros_like(run)
        shifted[:-step] = run[step:]
        run = np.where(run == step, run + np.minimum(shifted, cap - step),
                       run)
        step *= 2
    return np.minimum(run, cap)


def phase2_lengths(p0, cand, n: int):
    """Match length/offset per position from candidate diagonals and
    small-offset runs. Lengths are then capped at row end (phase 3
    re-merges same-offset chains)."""
    pos = np.arange(BLOCK, dtype=np.int32)

    # candidate path: diagonal continuation cand[i+1] == cand[i]+1
    diag = np.zeros(BLOCK, bool)
    valid = cand >= 0
    diag[:-1] = valid[:-1] & (cand[1:] == cand[:-1] + 1)
    drun = _suffix_run(diag, BLOCK)
    # run of r consecutive diagonal continuations => words match at
    # i..i+r, i.e. bytes i..i+r+3 match: length r+4 (word covers 4)
    mlen_c = np.where(valid, drun + MIN_MATCH, 0)
    off_c = np.where(valid, pos - cand, 0)

    # small-offset path
    so = p0["so_off"]
    sov = so > 0
    diag_s = np.zeros(BLOCK, bool)
    diag_s[:-1] = sov[:-1] & (so[1:] == so[:-1])
    srun = _suffix_run(diag_s, BLOCK)
    mlen_s = np.where(sov, srun + MIN_MATCH, 0)

    # choose the longer match; tie -> smaller offset
    use_s = (mlen_s > mlen_c) | ((mlen_s == mlen_c) & sov
                                 & (so < np.maximum(off_c, 1)))
    mlen = np.where(use_s, mlen_s, mlen_c)
    moff = np.where(use_s, so, off_c)

    # clamp to block tail rules (reference lz4.c MFLIMIT/LASTLITERALS)
    limit = np.maximum(n - END_LITERALS - pos, 0)
    mlen = np.minimum(mlen, limit)
    # cap at row end: parse lanes are rows; merging restores chains
    row_end = (pos // ROW + 1) * ROW
    mlen = np.minimum(mlen, row_end - pos)
    ok = (mlen >= MIN_MATCH) & (pos < max(n - TAIL_GUARD, 0)) & (moff > 0)
    mlen = np.where(ok, mlen, 0)
    moff = np.where(ok, moff, 0)
    return mlen, moff


def phase3_parse(mlen, moff, n: int):
    """Greedy per-row parse + in-row chain extension + cross-row merge.

    Returns slot arrays (NROWS, MAX_SLOTS): spos/slen/soff and per-row
    counts. Merged cross-row chains leave their continuation rows'
    leading match absorbed into the previous row's last slot."""
    spos = np.zeros((NROWS, MAX_SLOTS), np.int32)
    slen = np.zeros((NROWS, MAX_SLOTS), np.int32)
    soff = np.zeros((NROWS, MAX_SLOTS), np.int32)
    scnt = np.zeros(NROWS, np.int32)

    # per-row greedy walk (the kernel vectorizes rows; same semantics)
    for r in range(NROWS):
        base = r * ROW
        end = min(base + ROW, n)
        p = base
        k = 0
        while p < end:
            if mlen[p] >= MIN_MATCH:
                ln = int(mlen[p])
                of = int(moff[p])
                # in-row chain extension: contiguous same-offset match
                q = p + ln
                while q < end and mlen[q] >= MIN_MATCH and moff[q] == of:
                    ln += int(mlen[q])
                    q += int(mlen[q])
                spos[r, k] = p
                slen[r, k] = ln
                soff[r, k] = of
                k += 1
                p += ln
            else:
                p += 1
        scnt[r] = k

    # cross-row merge: row r+1's first match continues row r's last
    for r in range(1, NROWS):
        while True:
            if scnt[r] == 0:
                break
            # find the previous row with matches
            pr = r - 1
            while pr >= 0 and scnt[pr] == 0:
                pr -= 1
            if pr < 0:
                break
            lk = scnt[pr] - 1
            if (spos[r, 0] == spos[pr, lk] + slen[pr, lk]
                    and soff[r, 0] == soff[pr, lk]
                    and spos[r, 0] == r * ROW):
                slen[pr, lk] += slen[r, 0]
                # shift row r's slots down
                scnt[r] -= 1
                spos[r, :-1] = spos[r, 1:]
                slen[r, :-1] = slen[r, 1:]
                soff[r, :-1] = soff[r, 1:]
                # keep checking: the (new) first match of row r cannot
                # continue the chain again (it starts later in the row)
                break
            break
    return spos, slen, soff, scnt


def _lsic_len(val: int) -> int:
    """LSIC extension byte count for a length field >= 15."""
    return 0 if val < 15 else (val - 15) // 255 + 1


def phase5_emit(block, spos, slen, soff, scnt, n: int) -> bytes:
    """Serialize tokens to LZ4 block bytes (twin of the kernel's
    plane-scatter emission; here plain python for clarity — the byte
    layout is identical)."""
    out = bytearray()
    matches = []
    for r in range(NROWS):
        for k in range(scnt[r]):
            matches.append((int(spos[r, k]), int(slen[r, k]),
                            int(soff[r, k])))
    prev_end = 0
    for (p, ln, of) in matches:
        lit = p - prev_end
        mlc = ln - MIN_MATCH
        tok = (min(lit, 15) << 4) | min(mlc, 15)
        out.append(tok)
        if lit >= 15:
            rem = lit - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out += block[prev_end:p].tobytes()
        out.append(of & 0xFF)
        out.append(of >> 8)
        if mlc >= 15:
            rem = mlc - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        prev_end = p + ln
    # final literals
    lit = n - prev_end
    tok = min(lit, 15) << 4
    out.append(tok)
    if lit >= 15:
        rem = lit - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += block[prev_end:n].tobytes()
    return bytes(out)


def huge_run_flag(mlen, n: int) -> bool:
    """True when the block has a literal run >= HUGE_RUN (host fallback)."""
    no_match = (mlen < MIN_MATCH)[:n]
    if n < BLOCK:
        no_match = np.concatenate([no_match, np.zeros(BLOCK - n, bool)])
    run = _suffix_run(no_match, BLOCK)
    return bool(run.max(initial=0) >= HUGE_RUN)


def encode_block(block: np.ndarray, n: int):
    """Full twin pipeline. Returns (lz4_bytes | None, fallback: bool)."""
    p0 = phase0(block, n)
    cand = phase1_matcher(p0)
    mlen, moff = phase2_lengths(p0, cand, n)
    if huge_run_flag(mlen, n):
        return None, True
    spos, slen, soff, scnt = phase3_parse(mlen, moff, n)
    return phase5_emit(block, spos, slen, soff, scnt, n), False
