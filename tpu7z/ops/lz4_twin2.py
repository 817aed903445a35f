"""Numpy twin (v2) of the fused Pallas LZ4 encode kernel (ops/lz4_pallas.py).

This file IS the kernel specification: every phase maps 1:1 onto
full-plane TPU vector ops — no gathers, no scatters, no per-iteration
dynamic ref slicing (the constructs measured slow/broken on the target;
see docs/PERFORMANCE.md). The Pallas kernel is tested against this twin;
the twin round-trips through the LZ4 block decoder and the reference
binary.

TPU-first redesign of C/lz4/lz4.c:LZ4_compress_generic (the reference
walks a byte-serial hash table; here every step is a fixed-shape vector
pass):

  phase 0  u32 words at every position (elementwise)
  phase 1  TWO match-candidate tiers, combined by taking the longer
           run at each position:
           tier A: exhaustive nearest-offset matcher: for offset o in
             1..W a full-plane compare v[p] == v[p-o]; nearest wins.
             Finds EVERY match with offset <= W.
           tier B (sorted-neighbor, full 64K window): sort positions by
             key = hash16(8 bytes) << 16 | pos; the nearest previous
             same-8-byte occurrence is (with high probability) one of
             the K=2 predecessors in sorted order; candidates verify
             the full 8 bytes exactly (two carried u32 words), so a
             hash collision can only MISS a match, never fabricate
             one. This replaces the reference's byte-serial hash chain
             (C/lz4/lz4.c LZ4_compress_generic) with two device sorts.
  phase 2  match lengths = same-offset run lengths (suffix run via
           log-doubling shifts; tier B runs start at 8 verified
           bytes), capped at row end / block tail
  phase 3  greedy parse: 128-step cursor scan, one cursor lane per
           128-byte row, all rows parallel. Adjacent same-offset
           sequences are NOT re-merged (output stays valid; costs a
           few bytes on very long matches).
  phase 4  sequence geometry planes (anchors, run lengths, header
           sizes) + gapless output positions via prefix sums
  phase 5  CORE emission by hierarchical segment merge: every source
           position owns an 8-slot segment [tok][litrem][lit][offlo]
           [offhi][mlrem]; 17 merge levels shift each right sibling
           left by the left sibling's content length (low levels: a
           shift-variant select; high levels: a per-row barrel shifter
           of static rolls). The 255-runs of long literal lengths
           (L >= 270) are NOT in the core.
  phase 6  EXPANSION: insert the 255-run gaps. Gap bytes are >= 255
           apart by construction, and consecutive gaps are separated
           by >= 255 literal bytes, so each 128-byte output row
           intersects at most one gap: two barrel passes (pre-gap /
           post-gap shift) + a per-lane 3-way select are exact.

Size invariant used for merge widths: the core content of P source
positions is <= 1.25*P + 6 bytes (every match covers >= 4 positions and
injects <= 5 header bytes), so width 2*P + 8 never truncates.
"""

from __future__ import annotations

import numpy as np

MIN_MATCH = 4
ROW = 128
NROWS = 512
BLOCK = ROW * NROWS
W_DEFAULT = 64         # tier-A window (offsets searched exhaustively)
MIN_MATCH_B = 8        # tier-B verified bytes per candidate
HASH_C1 = np.uint32(0x9E3779B1)
HASH_C2 = np.uint32(0x85EBCA77)
TAIL_GUARD = 12        # no match may start in the last 12 bytes (lz4.h)
END_LITERALS = 5       # last 5 bytes are always literals
LONG_LIT = 270         # literal runs >= this get a 255-run gap


# ---------------------------------------------------------------------------
# flat shifts (the kernel implements these as lane/sublane roll pairs)
# ---------------------------------------------------------------------------

def shift_left(x: np.ndarray, k: int, fill=0):
    """out[i] = x[i+k] (fill beyond end)."""
    if k == 0:
        return x.copy()
    out = np.full_like(x, fill)
    if k < x.size:
        out[:-k] = x[k:]
    return out


def shift_right(x: np.ndarray, k: int, fill=0):
    """out[i] = x[i-k] (fill before start)."""
    if k == 0:
        return x.copy()
    out = np.full_like(x, fill)
    if k < x.size:
        out[k:] = x[:-k]
    return out


def prefix_sum_excl(x: np.ndarray) -> np.ndarray:
    """Exclusive prefix sum via log-doubling (kernel uses the same)."""
    acc = x.astype(np.int64).copy()
    step = 1
    while step < acc.size:
        acc += shift_right(acc, step)
        step *= 2
    return acc - x


def suffix_min(x: np.ndarray, fill: int) -> np.ndarray:
    """Inclusive suffix min via log-doubling."""
    acc = x.copy()
    step = 1
    while step < acc.size:
        acc = np.minimum(acc, shift_left(acc, step, fill=fill))
        step *= 2
    return acc


# ---------------------------------------------------------------------------
# phases 0-2
# ---------------------------------------------------------------------------

def phase0_words(block: np.ndarray) -> np.ndarray:
    u = block.astype(np.uint32)
    return (u
            | (shift_left(u, 1).astype(np.uint32) << np.uint32(8))
            | (shift_left(u, 2).astype(np.uint32) << np.uint32(16))
            | (shift_left(u, 3).astype(np.uint32) << np.uint32(24)))


def phase1_nearest_offset(v: np.ndarray, n: int, W: int) -> np.ndarray:
    """so[p] = smallest o in 1..W with v[p] == v[p-o], else 0."""
    so = np.zeros(BLOCK, np.int32)
    for o in range(1, W + 1):
        eq = shift_right(v, o) == v
        if o > 0:
            eq[:o] = False
        so = np.where((so == 0) & eq, o, so)
    pos = np.arange(BLOCK, dtype=np.int32)
    return np.where(pos < max(n - TAIL_GUARD, 0), so, 0)


def phase1b_sorted_candidates(v: np.ndarray, n: int) -> np.ndarray:
    """so8[p] = offset to a previous position with the same 8 bytes.

    Kernel form: one 3-operand device sort by key = hash16 << 16 | pos
    (keys are unique, so the order is fully determined), K=2 predecessor
    probes with exact 8-byte verification via the carried words, and a
    second 1-operand sort on key2 = pos << 16 | off to return to
    position order. Collisions can only lose candidates, never invent
    them, so the output is always a true >= 8-byte match.
    """
    w0 = v.astype(np.uint32)
    w1 = shift_left(v, 4).astype(np.uint32)
    h = (w0 * HASH_C1) ^ (w1 * HASH_C2)
    h16 = h >> np.uint32(16)
    pos = np.arange(BLOCK, dtype=np.uint32)
    key = (h16 << np.uint32(16)) | pos
    order = np.argsort(key)
    skey = key[order]
    sw0 = w0[order]
    sw1 = w1[order]
    idx = np.arange(BLOCK)
    so8s = np.zeros(BLOCK, np.int64)
    for k in (1, 2):
        pk = shift_right(skey, k)
        p0 = shift_right(sw0, k)
        p1 = shift_right(sw1, k)
        verify = (((pk >> np.uint32(16)) == (skey >> np.uint32(16)))
                  & (p0 == sw0) & (p1 == sw1) & (idx >= k))
        off = ((skey & np.uint32(0xFFFF)).astype(np.int64)
               - (pk & np.uint32(0xFFFF)).astype(np.int64))
        so8s = np.where((so8s == 0) & verify, off, so8s)
    key2 = (((skey & np.uint32(0xFFFF)) << np.uint32(16))
            | so8s.astype(np.uint32))
    key2s = np.sort(key2)
    so8 = (key2s & np.uint32(0xFFFF)).astype(np.int64)
    posi = np.arange(BLOCK, dtype=np.int64)
    return np.where(posi < max(n - TAIL_GUARD, 0), so8, 0)


def phase1b4_sorted_candidates(v: np.ndarray, n: int):
    """(so4a, so4b): offsets to the nearest / second-nearest previous
    position with the same 4 bytes, from ONE sort keyed on the 4-byte
    hash. Same scheme as phase1b (hash16<<16|pos keys, predecessor
    probes with exact verification, unsort by pos<<16|off carrying the
    second offset as a sort payload). Replaces the exhaustive tier-A
    window: a verified nearest-4-byte candidate at ANY offset subsumes
    the W-window scan (measured identical ratio with W=64 on top)."""
    w0 = v.astype(np.uint32)
    h16 = (w0 * HASH_C1) >> np.uint32(16)
    pos = np.arange(BLOCK, dtype=np.uint32)
    key = (h16 << np.uint32(16)) | pos
    order = np.argsort(key)
    skey = key[order]
    sw0 = w0[order]
    idx = np.arange(BLOCK)
    outs = []
    for k in (1, 2):
        pk = shift_right(skey, k)
        p0 = shift_right(sw0, k)
        verify = (((pk >> np.uint32(16)) == (skey >> np.uint32(16)))
                  & (p0 == sw0) & (idx >= k))
        off = ((skey & np.uint32(0xFFFF)).astype(np.int64)
               - (pk & np.uint32(0xFFFF)).astype(np.int64))
        outs.append(np.where(verify, off, 0))
    key2 = (((skey & np.uint32(0xFFFF)) << np.uint32(16))
            | outs[0].astype(np.uint32))
    order2 = np.argsort(key2)
    key2s = key2[order2]
    so4b = outs[1][order2]
    so4a = (key2s & np.uint32(0xFFFF)).astype(np.int64)
    posi = np.arange(BLOCK, dtype=np.int64)
    lim = max(n - TAIL_GUARD, 0)
    return (np.where(posi < lim, so4a, 0),
            np.where(posi < lim, so4b, 0))


def suffix_run(flag: np.ndarray, cap: int) -> np.ndarray:
    """run[i] = consecutive True count at i, i+1, ... (capped)."""
    run = flag.astype(np.int32)
    step = 1
    while step < cap:
        shifted = shift_left(run, step)
        run = np.where(run == step,
                       run + np.minimum(shifted, cap - step), run)
        step *= 2
    return np.minimum(run, cap)


def _tier_run_lengths(so: np.ndarray, kmin: int) -> np.ndarray:
    """Uncapped verified lengths from same-offset diag runs: each
    position in the run certifies `kmin` bytes at its offset, so a run
    of r+1 positions covers r + kmin bytes."""
    sov = so > 0
    diag = sov & (shift_left(so, 1) == so)
    srun = suffix_run(diag, BLOCK)
    return np.where(sov, srun + kmin, 0)


def phase2_lengths(so: np.ndarray, n: int, so8: np.ndarray | None = None,
                   extra_planes=()):
    """(mlen, moff) planes; candidate tiers combined by longer run
    (earlier planes win ties); mlen capped at row end and block tail.
    extra_planes: iterable of (so_plane, verified_kmin)."""
    pos = np.arange(BLOCK, dtype=np.int32)
    mlen = _tier_run_lengths(so, MIN_MATCH)
    moff = so.astype(np.int64)
    planes = list(extra_planes)
    if so8 is not None:
        planes.append((so8, MIN_MATCH_B))
    for sp, kmin in planes:
        ml = _tier_run_lengths(sp, kmin)
        use = ml > mlen
        mlen = np.where(use, ml, mlen)
        moff = np.where(use, sp.astype(np.int64), moff)

    limit = np.maximum(n - END_LITERALS - pos, 0)
    mlen = np.minimum(mlen, limit)
    row_end = (pos // ROW + 1) * ROW
    mlen = np.minimum(mlen, row_end - pos)
    ok = (mlen >= MIN_MATCH) & (pos < max(n - TAIL_GUARD, 0)) & (moff > 0)
    mlen = np.where(ok, mlen, 0)
    moff = np.where(ok, moff, 0)
    return mlen.astype(np.int64), moff


# ---------------------------------------------------------------------------
# phase 3: row-parallel greedy cursor scan
# ---------------------------------------------------------------------------

def phase3_parse(mlen: np.ndarray) -> np.ndarray:
    """is_start plane via a 128-step scan, one cursor lane per row,
    with one-step LAZY matching: when the next position's match is
    more than one byte longer, emit a literal and start there instead
    (LZ4_compress_generic's lazy heuristic recast for the cursor scan).

    Kernel form: c is an (NROWS,) int vector; the lane reads are
    one-hot multiply-reduces; the is_start write is a one-hot OR.
    """
    ml2 = mlen.reshape(NROWS, ROW)
    is_start = np.zeros((NROWS, ROW), bool)
    c = np.zeros(NROWS, np.int64)
    rows = np.arange(NROWS)
    for _ in range(ROW):
        cc = np.minimum(c, ROW - 1)
        cur = ml2[rows, cc]
        nxt = ml2[rows, np.minimum(cc + 1, ROW - 1)]
        defer = (nxt > cur + 1) & (cc + 1 < ROW)
        take = (c < ROW) & (cur >= MIN_MATCH) & ~defer
        is_start[rows[take], cc[take]] = True
        c = np.where(take, c + cur, c + 1)
    return is_start.reshape(-1)


def phase4_geometry(block, mlen, moff, is_start, n: int):
    pos = np.arange(BLOCK, dtype=np.int64)
    in_range = pos < n
    mstart = is_start & in_range

    # covered[p]: p is inside a selected match. Matches never overlap and
    # never cross row boundaries, so within each row: covered = suffix
    # effect of starts. Kernel computes it with the same in-row trick.
    reach = np.where(mstart, pos + mlen, 0)  # first pos AFTER the match
    # propagate max of reach over preceding positions within the row
    acc = reach.reshape(NROWS, ROW).copy()
    step = 1
    while step < ROW:
        sh = np.zeros_like(acc)
        sh[:, step:] = acc[:, :-step]
        acc = np.maximum(acc, sh)
        step *= 2
    covered = pos < acc.reshape(BLOCK)
    covered &= in_range

    kept = in_range & ~covered

    # parity-pair merge: a lane-0 match start on an ODD row whose
    # previous row has a match ending exactly at the row boundary with
    # the SAME offset becomes a continuation — it emits nothing and its
    # length is absorbed by the head. Merged mlc <= 252, so a single
    # match-length extension byte always suffices. Local rule (no chain
    # scan): chains are exactly head + at most one continuation.
    lane = pos % ROW
    rowi = pos // ROW
    end_m = mstart & (lane + mlen == ROW)
    em2 = end_m.reshape(NROWS, ROW)
    mo2 = moff.reshape(NROWS, ROW)
    end_off_row = (mo2 * em2).sum(axis=1)          # <=1 end-match/row
    has_end_row = em2.any(axis=1)
    prev_has_end = np.concatenate([[False], has_end_row[:-1]])
    prev_end_off = np.concatenate([[0], end_off_row[:-1]])
    cont = (mstart & (lane == 0) & (rowi % 2 == 1)
            & prev_has_end[rowi] & (moff == prev_end_off[rowi]))
    head = mstart & ~cont
    c2 = cont.reshape(NROWS, ROW)
    ml2 = mlen.reshape(NROWS, ROW)
    cont_len_row = np.where(c2[:, 0], ml2[:, 0], 0)
    cont_off_row = np.where(c2[:, 0], mo2[:, 0], -1)
    next_cont_len = np.concatenate([cont_len_row[1:], [0]])
    next_cont_off = np.concatenate([cont_off_row[1:], [-1]])
    add = np.where(end_m & head & (moff == next_cont_off[rowi]),
                   next_cont_len[rowi], 0)
    mlen_m = mlen + add

    prev_covered = shift_right(covered.astype(np.int8), 1).astype(bool)
    anchor = in_range & ((pos == 0) | (prev_covered & (head | ~covered)))

    # next match start at-or-after p, with its mlc nibble, via one
    # suffix-min over the encoded pair pos*16 + min(mlc,15)
    mlc = np.where(head, mlen_m - MIN_MATCH, 0)
    INF = np.int64(1) << 40
    enc = np.where(head, pos * 16 + np.minimum(mlc, 15), INF)
    enc = suffix_min(enc, INF)
    next_start = np.where(enc == INF, n, np.minimum(enc >> 4, n))
    next_nib = np.where(enc == INF, 0, enc & 15)

    L = np.where(anchor, next_start - pos, 0)
    has_ext = anchor & (L >= 15)
    e = np.where(has_ext, (L - 15) // 255 + 1, 0)   # total ext bytes
    gap255 = np.maximum(e - 1, 0)                   # 255-run length
    litrem = np.where(has_ext, (L - 15) % 255, 0)
    long_run = anchor & (L >= LONG_LIT)
    assert np.all(gap255[~long_run] == 0)

    ml_ext = head & (mlc >= 15)
    token = np.where(anchor, (np.minimum(L, 15) << 4) | next_nib, 0)

    # gapless (core) content length per position (continuations emit
    # nothing: only heads carry token/offset/ml-ext bytes)
    injH_core = np.where(anchor, 1 + np.minimum(e, 1), 0)  # tok + litrem?
    injT = np.where(head, 2 + np.where(ml_ext, 1, 0), 0)
    glen = np.where(kept, 1, 0) + injH_core + injT
    glen = np.where(in_range, glen, 0)

    core_pos = prefix_sum_excl(glen)     # core dst of each position's seg
    core_used = int(glen.sum())

    # gap prefix: gaps inserted after each long-run token byte
    gap_here = np.where(long_run, gap255, 0)
    gap_before = prefix_sum_excl(gap_here)  # gaps strictly before p
    used = core_used + int(gap_here.sum())

    return dict(kept=kept, anchor=anchor, mstart=head, token=token,
                litrem=litrem, e=e, gap255=gap255, long_run=long_run,
                mlc=mlc, ml_ext=ml_ext, glen=glen, core_pos=core_pos,
                core_used=core_used, gap_here=gap_here,
                gap_before=gap_before, used=used)


# ---------------------------------------------------------------------------
# phase 5: hierarchical core compaction
# ---------------------------------------------------------------------------

SEG0 = 8


def _merge_level(content: np.ndarray, lens: np.ndarray):
    """Merge adjacent segment pairs: right sibling shifts left so its
    content starts at the left sibling's length. Returns (content', lens').

    content: (S, w); lens: (S,). Output: (S//2, 2*w), (S//2,).
    Kernel form: reshape (S,w)->(S//2,2w) is a free relayout; the shift
    amount per merged row is v = w - llen (shift left by v), applied as
    a shift-variant select (low levels) or a bit barrel shifter (high
    levels). numpy just rolls per row.
    """
    S, w = content.shape
    merged = content.reshape(S // 2, 2 * w)
    llen = lens[0::2]
    out = merged.copy()
    out[:, w:] = 0
    idx = np.arange(2 * w)
    # shift lanes [w, 2w) left by (w - llen): dst j gets src j + (w-llen)
    v = w - llen
    src = idx[None, :] + v[:, None]
    valid = (idx[None, :] >= llen[:, None]) & (src < 2 * w)
    srcc = np.clip(src, 0, 2 * w - 1)
    rows = np.arange(S // 2)[:, None]
    add = np.where(valid, merged[rows, srcc], 0)
    out = np.where(idx[None, :] >= llen[:, None], add, out)
    return out, llen + lens[1::2]


def phase5_core(block, moff, geo, n: int) -> np.ndarray:
    """Level-0 segments + 17 merge levels -> gapless core bytes."""
    kept = geo["kept"]
    anchor = geo["anchor"]
    mstart = geo["mstart"]
    e = geo["e"]

    has_rem = anchor & (e >= 1)
    lit_off = np.where(anchor, 1 + np.minimum(e, 1), 0)
    t_off = lit_off + np.where(kept, 1, 0)

    seg = np.zeros((BLOCK, SEG0), np.int64)
    lane = np.arange(SEG0)[None, :]
    def put(mask, off, val):
        seg[:] += np.where(mask[:, None] & (lane == off[:, None]),
                           val[:, None], 0)

    put(anchor, np.zeros(BLOCK, np.int64), geo["token"].astype(np.int64))
    put(has_rem, np.ones(BLOCK, np.int64), geo["litrem"].astype(np.int64))
    put(kept, lit_off, block.astype(np.int64))
    put(mstart, t_off, moff & 0xFF)
    put(mstart, t_off + 1, moff >> 8)
    put(geo["ml_ext"], t_off + 2, geo["mlc"] - 15)

    content = seg
    lens = geo["glen"].astype(np.int64)
    while content.shape[0] > 1:
        content, lens = _merge_level(content, lens)
    return content[0]  # (8 * BLOCK,) core plane


# ---------------------------------------------------------------------------
# phase 6: gap expansion (255-runs of long literal lengths)
# ---------------------------------------------------------------------------

def phase6_expand(core: np.ndarray, geo, n: int) -> bytes:
    """out[q] = core[q - S(q)] with piecewise-constant S; gap bytes = 255.

    Gap j (for long run at source p): output range
      [core_tokend_j + gapstart_shift, ... + gap255_j)
    where core_tokend_j = core_pos[p] + 1 (just after the token byte).
    Each 128-byte output row intersects <= 1 gap (gaps >= 255 long or
    separated by >= 255 literals).
    """
    used = geo["used"]
    long_run = geo["long_run"]
    core_pos = geo["core_pos"]
    gap255 = geo["gap255"]
    gap_before = geo["gap_before"]

    # gap list in OUTPUT coordinates
    idx = np.where(long_run)[0]
    gs = core_pos[idx] + 1 + gap_before[idx]          # gap start (output)
    ge = gs + gap255[idx]                             # gap end (output)
    # shift before gap j = gap_before; after = gap_before + gap255
    s_pre = gap_before[idx]
    s_post = s_pre + gap255[idx]

    out = np.zeros(used, np.int32)
    q = np.arange(used, dtype=np.int64)
    # piecewise shift: S(q) = s_post of the last gap with ge <= q ... do
    # exactly as the kernel: per output row, find the (single) gap with
    # gs < row_end and ge > row_start, plus the prevailing shift.
    S_of_q = np.zeros(used, np.int64)
    inside_gap = np.zeros(used, bool)
    for j in range(idx.size):
        S_of_q = np.where(q >= ge[j], s_post[j], S_of_q)
        inside_gap |= (q >= gs[j]) & (q < ge[j])
    src = q - S_of_q
    srcc = np.clip(src, 0, core.size - 1)
    out = np.where(inside_gap, 255, core[srcc])
    return out.astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------

def encode_block(block: np.ndarray, n: int, W: int = W_DEFAULT,
                 tier_b: bool = True) -> bytes:
    """Full twin pipeline for one 64KB (or shorter) block."""
    assert block.size == BLOCK
    v = phase0_words(block)
    so = phase1_nearest_offset(v, n, W)
    so8 = phase1b_sorted_candidates(v, n) if tier_b else None
    extra = ()
    if tier_b:
        so4a, so4b = phase1b4_sorted_candidates(v, n)
        extra = ((so4a, 4), (so4b, 4))
    mlen, moff = phase2_lengths(so, n, so8, extra_planes=extra)
    is_start = phase3_parse(mlen)
    geo = phase4_geometry(block, mlen, moff, is_start, n)
    core = phase5_core(block, moff, geo, n)
    return phase6_expand(core, geo, n)
