"""Plane math for the fused LZ4 device encoder.

Pure-jnp functions over fixed-shape int32 planes, written so that every
operation lowers to a fast Mosaic construct: static lane/sublane shifts,
elementwise select, in-row rolls, `fori_loop` with small carries, and a
couple of one-hot matmuls. NO gathers, NO scatters, NO per-iteration
dynamic slicing (measured pathological on the target — docs/PERFORMANCE.md).

These functions are the single source of truth for the kernel: the
Pallas kernel body (ops/lz4_pallas.py) composes them on VMEM values, and
the unit tests run them directly (CPU jnp) against the bit-exact numpy
twin (ops/lz4_twin2.py). Behavioral reference: C/lz4/lz4.c
LZ4_compress_generic (format), redesigned as data-parallel phases — see
the twin's module docstring for the phase map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MIN_MATCH = 4
MIN_MATCH_B = 8      # tier-B verified bytes per sorted-neighbor candidate
ROW = 128
NROWS = 512
BLOCK = ROW * NROWS
W_DEFAULT = 0        # tier-A window; 0 = rely on tier-B4 (subsumes it)
TAIL_GUARD = 12
END_LITERALS = 5
LONG_LIT = 270
SEG0 = 8
HASH_C1 = 0x9E3779B1
HASH_C2 = 0x85EBCA77

# core capacity: content <= 1.25*BLOCK + 6; pad to row multiple
CORE_ROWS = 672                      # 672*128 = 86016 >= 81926
CORE_CAP = CORE_ROWS * ROW
# output capacity: core + total 255-run bytes (<= sum L/255 <= 257)
OUT_ROWS = CORE_ROWS + 4
OUT_CAP = OUT_ROWS * ROW


def _i32(x):
    return x.astype(jnp.int32)


# ---------------------------------------------------------------------------
# flat shifts over (NROWS, ROW) planes
# ---------------------------------------------------------------------------

def row_shift_up(x, kr):
    """out[r] = x[r+kr] (zero rows at the end)."""
    if kr == 0:
        return x
    if kr >= x.shape[0]:
        return jnp.zeros_like(x)
    pad = jnp.zeros((kr, x.shape[1]), x.dtype)
    return jnp.concatenate([x[kr:], pad], axis=0)


def row_shift_down(x, kr):
    if kr == 0:
        return x
    if kr >= x.shape[0]:
        return jnp.zeros_like(x)
    pad = jnp.zeros((kr, x.shape[1]), x.dtype)
    return jnp.concatenate([pad, x[:-kr]], axis=0)


def shiftl_flat(x, k):
    """Flat left shift on a 2D plane: out.flat[i] = x.flat[i+k], zero fill."""
    R, C = x.shape
    kr, kl = k // C, k % C
    a = row_shift_up(x, kr)
    if kl == 0:
        return a
    b = row_shift_up(a, 1)
    return jnp.concatenate([a[:, kl:], b[:, :kl]], axis=1)


def shiftr_flat(x, k):
    """Flat right shift: out.flat[i] = x.flat[i-k], zero fill."""
    R, C = x.shape
    kr, kl = k // C, k % C
    a = row_shift_down(x, kr)
    if kl == 0:
        return a
    b = row_shift_down(a, 1)
    return jnp.concatenate([b[:, C - kl:], a[:, :C - kl]], axis=1)


def prefix_sum_excl_flat(x):
    """Exclusive flat prefix sum over a 2D int32 plane (non-negative
    values): in-row inclusive scan, then a full-lane row-carry pass.
    All ops stay (R, C)-shaped — the target's Mosaic lowering crashes
    on (R, 1)-shaped loops."""
    R, C = x.shape
    acc = x
    step = 1
    while step < C:
        sh = jnp.concatenate(
            [jnp.zeros((R, step), x.dtype), acc[:, :-step]], axis=1)
        acc = acc + sh
        step *= 2
    # row totals broadcast to every lane: acc is non-decreasing in-row,
    # so a lane roll-max tree yields the last lane everywhere
    tot = acc
    s = 1
    while s < C:
        rolled = jnp.concatenate([tot[:, s:], tot[:, :s]], axis=1)
        tot = jnp.maximum(tot, rolled)
        s *= 2
    carry = tot
    step = 1
    while step < R:
        sh = jnp.concatenate(
            [jnp.zeros((step, C), x.dtype), carry[:-step]], axis=0)
        carry = carry + sh
        step *= 2
    return acc + (carry - tot) - x


def suffix_max_flat(x):
    """Inclusive flat suffix max (values >= 0; zero fill is neutral)."""
    R, C = x.shape
    acc = x
    step = 1
    total = R * C
    while step < total:
        acc = jnp.maximum(acc, shiftl_flat(acc, step))
        step *= 2
    return acc


# ---------------------------------------------------------------------------
# phases
# ---------------------------------------------------------------------------

def phase0_words(block):
    """block: (NROWS, ROW) int32 bytes -> u32 words (as int32 bit pattern)."""
    u = block
    w = (u
         | (shiftl_flat(u, 1) << 8)
         | (shiftl_flat(u, 2) << 16)
         | (shiftl_flat(u, 3) << 24))
    return w


def phase1_nearest_offset(v, n, W):
    """so[p] = nearest o in 1..W with v[p-o] == v[p], else 0.

    fori_loop: carry (so, vsh); per step one flat right-shift by 1.
    """
    pos = _pos_plane()

    def body(o, carry):
        so, vsh = carry
        vsh = shiftr_flat(vsh, 1)
        eq = (vsh == v) & (pos >= o)
        so = jnp.where((so == 0) & eq, o, so)
        return so, vsh

    so0 = jnp.zeros_like(v)
    so, _ = jax.lax.fori_loop(1, W + 1, body, (so0, v))
    return jnp.where(pos < jnp.maximum(n - TAIL_GUARD, 0), so, 0)


def _pos_plane():
    r = jax.lax.broadcasted_iota(jnp.int32, (NROWS, ROW), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (NROWS, ROW), 1)
    return r * ROW + c


def tier_b_candidates(words, ns):
    """Tier-B sorted-neighbor matcher over the FULL 64K block window.

    words: (B, BLOCK) int32 — the u32 word at every position (phase 0);
    ns: (B,) int32 valid lengths. Returns so8 (B, BLOCK) int32: offset
    to a previous position with the same 8 bytes (0 = none). Exact: a
    candidate is emitted only after full 8-byte verification via the
    two carried words, so hash collisions can only miss matches.

    XLA-level (runs between the Pallas stages): one 3-operand
    lax.sort by key = hash16 << 16 | pos (unique keys => deterministic
    order), K=2 predecessor probes, then a 1-operand unsort by
    key2 = pos << 16 | off. Replaces C/lz4/lz4.c's byte-serial hash
    chain with two device sorts.
    """
    B = words.shape[0]
    w0 = words.astype(jnp.uint32)
    zero4 = jnp.zeros((B, 4), jnp.uint32)
    w1 = jnp.concatenate([w0[:, 4:], zero4], axis=1)
    h16 = ((w0 * jnp.uint32(HASH_C1)) ^ (w1 * jnp.uint32(HASH_C2)))
    h16 = h16 >> jnp.uint32(16)
    pos = jax.lax.broadcasted_iota(jnp.uint32, (B, BLOCK), 1)
    key = (h16 << jnp.uint32(16)) | pos
    skey, sw0, sw1 = jax.lax.sort((key, w0, w1), dimension=1, num_keys=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, BLOCK), 1)
    so8s = jnp.zeros((B, BLOCK), jnp.int32)
    for k in (1, 2):
        zk = jnp.zeros((B, k), jnp.uint32)
        pk = jnp.concatenate([zk, skey[:, :-k]], axis=1)
        p0 = jnp.concatenate([zk, sw0[:, :-k]], axis=1)
        p1 = jnp.concatenate([zk, sw1[:, :-k]], axis=1)
        verify = (((pk >> jnp.uint32(16)) == (skey >> jnp.uint32(16)))
                  & (p0 == sw0) & (p1 == sw1) & (col >= k))
        off = ((skey & jnp.uint32(0xFFFF)).astype(jnp.int32)
               - (pk & jnp.uint32(0xFFFF)).astype(jnp.int32))
        so8s = jnp.where((so8s == 0) & verify, off, so8s)
    key2 = (((skey & jnp.uint32(0xFFFF)) << jnp.uint32(16))
            | so8s.astype(jnp.uint32))
    (key2s,) = jax.lax.sort((key2,), dimension=1, num_keys=1)
    so8 = (key2s & jnp.uint32(0xFFFF)).astype(jnp.int32)
    guard = jnp.maximum(ns.astype(jnp.int32) - TAIL_GUARD, 0)
    return jnp.where(col < guard[:, None], so8, 0)


def tier_b4_candidates(words, ns):
    """Tier-B4: nearest + second-nearest same-4-byte candidates over
    the full 64K window, from ONE lax.sort keyed on the 4-byte hash.
    Subsumes the exhaustive tier-A window at any W (verified: identical
    ratio with tier-A stacked on top). Returns (so4a, so4b), each
    (B, BLOCK) int32; 0 = none. Exact-verified, so collisions can only
    miss matches."""
    B = words.shape[0]
    w0 = words.astype(jnp.uint32)
    h16 = (w0 * jnp.uint32(HASH_C1)) >> jnp.uint32(16)
    pos = jax.lax.broadcasted_iota(jnp.uint32, (B, BLOCK), 1)
    key = (h16 << jnp.uint32(16)) | pos
    skey, sw0 = jax.lax.sort((key, w0), dimension=1, num_keys=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, BLOCK), 1)
    outs = []
    for k in (1, 2):
        zk = jnp.zeros((B, k), jnp.uint32)
        pk = jnp.concatenate([zk, skey[:, :-k]], axis=1)
        p0 = jnp.concatenate([zk, sw0[:, :-k]], axis=1)
        verify = (((pk >> jnp.uint32(16)) == (skey >> jnp.uint32(16)))
                  & (p0 == sw0) & (col >= k))
        off = ((skey & jnp.uint32(0xFFFF)).astype(jnp.int32)
               - (pk & jnp.uint32(0xFFFF)).astype(jnp.int32))
        outs.append(jnp.where(verify, off, 0))
    key2 = (((skey & jnp.uint32(0xFFFF)) << jnp.uint32(16))
            | outs[0].astype(jnp.uint32))
    key2s, so4b = jax.lax.sort((key2, outs[1]), dimension=1, num_keys=1)
    so4a = (key2s & jnp.uint32(0xFFFF)).astype(jnp.int32)
    guard = jnp.maximum(ns.astype(jnp.int32) - TAIL_GUARD, 0)
    keep = col < guard[:, None]
    return jnp.where(keep, so4a, 0), jnp.where(keep, so4b, 0)


def suffix_run_flat(flag, cap):
    """run[i] = consecutive nonzero count at i.. (capped), log-doubling."""
    run = _i32(flag)
    step = 1
    while step < cap:
        sh = shiftl_flat(run, step)
        run = jnp.where(run == step,
                        run + jnp.minimum(sh, cap - step), run)
        step *= 2
    return jnp.minimum(run, cap)


def _tier_runs(so, kmin):
    """Uncapped verified lengths from same-offset diag runs."""
    sov = so > 0
    diag = sov & (shiftl_flat(so, 1) == so)
    srun = suffix_run_flat(diag, BLOCK)
    return jnp.where(sov, srun + kmin, 0)


def phase2_lengths(so, n, so8=None, extra_planes=()):
    """Candidate tiers combined by longer verified run (earlier planes
    win ties); extra_planes: iterable of (so_plane, verified_kmin)."""
    pos = _pos_plane()
    mlen = _tier_runs(so, MIN_MATCH)
    moff = so
    planes = list(extra_planes)
    if so8 is not None:
        planes.append((so8, MIN_MATCH_B))
    for sp, kmin in planes:
        ml = _tier_runs(sp, kmin)
        use = ml > mlen
        mlen = jnp.where(use, ml, mlen)
        moff = jnp.where(use, sp, moff)

    limit = jnp.maximum(n - END_LITERALS - pos, 0)
    mlen = jnp.minimum(mlen, limit)
    lane = jax.lax.broadcasted_iota(jnp.int32, (NROWS, ROW), 1)
    mlen = jnp.minimum(mlen, ROW - lane)
    ok = ((mlen >= MIN_MATCH) & (pos < jnp.maximum(n - TAIL_GUARD, 0))
          & (moff > 0))
    mlen = jnp.where(ok, mlen, 0)
    moff = jnp.where(ok, moff, 0)
    return mlen, moff


def phase3_parse(mlen):
    """is_start plane: 128-step cursor scan, one cursor lane per row.

    Carries are int32 (the target's Mosaic lowering rejects bool loop
    carries); the returned plane is bool.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (NROWS, ROW), 1)

    def body(_, carry):
        c, is_start = carry               # c: (NROWS, 1) int32
        cc = jnp.minimum(c, ROW - 1)
        oh = lane == cc
        cur = jnp.sum(mlen * oh, axis=1, keepdims=True)   # (NROWS,1)
        ohn = lane == jnp.minimum(cc + 1, ROW - 1)
        nxt = jnp.sum(mlen * ohn, axis=1, keepdims=True)
        # one-step lazy matching: defer when the next position's match
        # is more than one byte longer (and is inside the row)
        defer = (nxt > cur + 1) & (cc + 1 < ROW)
        take = (c < ROW) & (cur >= MIN_MATCH) & jnp.logical_not(defer)
        is_start = is_start | (_i32(oh & take))
        c = jnp.where(take, c + cur, c + 1)
        return c, is_start

    # derive the initial carries from the input so their sharding
    # annotations (shard_map varying axes) match the body's outputs
    c0 = mlen[:, :1] * 0
    st0 = mlen * 0
    _, is_start = jax.lax.fori_loop(0, ROW, body, (c0, st0))
    return is_start > 0


def phase4_geometry(mlen, moff, is_start, n):
    pos = _pos_plane()
    lane = jax.lax.broadcasted_iota(jnp.int32, (NROWS, ROW), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (NROWS, ROW), 0)
    in_range = pos < n
    mstart = is_start & in_range

    # covered: in-row running max of reach (matches are row-capped)
    reach = jnp.where(mstart, lane + mlen, 0)   # row-local reach
    acc = reach
    step = 1
    while step < ROW:
        sh = jnp.concatenate(
            [jnp.zeros((NROWS, step), jnp.int32), acc[:, :-step]], axis=1)
        acc = jnp.maximum(acc, sh)
        step *= 2
    covered = (lane < acc) & in_range
    kept = in_range & ~covered

    # parity-pair merge: a lane-0 match start on an ODD row whose
    # previous row has a match ending exactly at the row boundary with
    # the SAME offset is a continuation — it emits nothing; the head
    # absorbs its length. Merged mlc <= 252, so one ml-ext byte always
    # suffices. Purely local (static row shifts), no chain scan.
    end_m = mstart & (lane + mlen == ROW)
    end_off = _lane_bcast_max(jnp.where(end_m, moff, 0))
    has_end = end_off > 0
    prev_end_off = row_shift_down(end_off, 1)
    prev_has = row_shift_down(_i32(has_end), 1) > 0
    cont = (mstart & (lane == 0) & (rowi % 2 == 1)
            & prev_has & (moff == prev_end_off))
    head = mstart & ~cont
    cont_len = _lane_bcast_max(jnp.where(cont, mlen, 0))
    cont_off = _lane_bcast_max(jnp.where(cont, moff, 0))
    next_cont_len = row_shift_up(cont_len, 1)
    next_cont_off = row_shift_up(cont_off, 1)
    add = jnp.where(end_m & head & (moff == next_cont_off)
                    & (next_cont_len > 0), next_cont_len, 0)
    mlen_m = mlen + add

    prev_cov = shiftr_flat(_i32(covered), 1) > 0
    anchor = in_range & ((pos == 0) | (prev_cov & (head | ~covered)))

    # next match start + its mlc nibble via one suffix-max of encoded
    # (BLOCK - pos) * 16 + nib  (bigger = earlier; zero fill neutral)
    mlc = jnp.where(head, mlen_m - MIN_MATCH, 0)
    nib = jnp.minimum(mlc, 15)
    enc = jnp.where(head, (BLOCK - pos) * 16 + nib, 0)
    best = suffix_max_flat(enc)
    has_next = best > 0
    next_start = jnp.where(has_next, BLOCK - (best >> 4), n)
    next_start = jnp.minimum(next_start, n)
    next_nib = jnp.where(has_next, best & 15, 0)

    L = jnp.where(anchor, next_start - pos, 0)
    has_ext = anchor & (L >= 15)
    e = jnp.where(has_ext, (L - 15) // 255 + 1, 0)
    gap255 = jnp.maximum(e - 1, 0)
    litrem = jnp.where(has_ext, (L - 15) % 255, 0)
    long_run = anchor & (L >= LONG_LIT)

    ml_ext = head & (mlc >= 15)
    token = jnp.where(anchor, (jnp.minimum(L, 15) << 4) | next_nib, 0)

    injH_core = jnp.where(anchor, 1 + jnp.minimum(e, 1), 0)
    injT = jnp.where(head, 2 + _i32(ml_ext), 0)
    glen = jnp.where(in_range, _i32(kept) + injH_core + injT, 0)
    mstart = head

    core_pos = prefix_sum_excl_flat(glen)
    core_used = (core_pos[NROWS - 1, ROW - 1]
                 + glen[NROWS - 1, ROW - 1])

    gap_here = jnp.where(long_run, gap255, 0)
    gap_before = prefix_sum_excl_flat(gap_here)
    used = (core_used + gap_before[NROWS - 1, ROW - 1]
            + gap_here[NROWS - 1, ROW - 1])

    return dict(kept=kept, anchor=anchor, mstart=mstart, token=token,
                litrem=litrem, e=e, gap255=gap255, long_run=long_run,
                mlc=mlc, ml_ext=ml_ext, glen=glen, core_pos=core_pos,
                core_used=core_used, gap_here=gap_here,
                gap_before=gap_before, used=used)


# ---------------------------------------------------------------------------
# phase 5: hierarchical core compaction
# ---------------------------------------------------------------------------

def _level_width(k):
    """Physical width for segments of 2**k positions (content bound is
    1.25 * 2**k + 6)."""
    need = 2 * (1 << k) + 8
    if need <= 128:
        return ((need + 7) // 8) * 8
    return ((need + 127) // 128) * 128


def _shift_left_lanes(x, v):
    """Static left shift along axis 1 by v, zero fill."""
    if v == 0:
        return x
    R, C = x.shape
    if v >= C:
        return jnp.zeros_like(x)
    return jnp.concatenate([x[:, v:], jnp.zeros((R, v), x.dtype)], axis=1)


def _merge_select(merged, llen, w, max_llen):
    """Variant-select merge for small widths: right half (lanes >= w)
    shifts left by (w - llen). Cost: one static shift + select per
    distinct llen value."""
    R, C = merged.shape        # C == 2*w
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    right_only = jnp.where(lane >= w, merged, 0)
    out = jnp.where(lane < w, merged, 0)
    acc = jnp.zeros_like(merged)
    for ll in range(0, min(max_llen, w) + 1):
        cand = _shift_left_lanes(right_only, w - ll)
        acc = jnp.where(llen == ll, cand, acc)
    return out + acc


def _merge_barrel(merged, llen, w):
    """Barrel merge for large widths: shift right half left by v = w-llen
    using power-of-two static shifts selected per row."""
    R, C = merged.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    right_only = jnp.where(lane >= w, merged, 0)
    out = jnp.where(lane < w, merged, 0)
    v = w - llen               # (R,1), in [0, w]
    acc = right_only
    bit = 1
    while bit <= w:
        sh = _shift_left_lanes(acc, bit)
        acc = jnp.where((v & bit) > 0, sh, acc)
        bit *= 2
    return out + acc


P8_ROWS = BLOCK * SEG0 // ROW      # 4096: packed plane rows


def expand8(x):
    """(NROWS, ROW) -> (P8_ROWS, ROW) with out.flat[f] = x.flat[f // 8].

    One exact one-hot stretch matmul (values < 2**24 stay exact in f32)
    plus a wide->tall reshape; both constructs are Mosaic-safe on the
    target (docs/PERFORMANCE.md probe list).
    """
    j = jax.lax.broadcasted_iota(jnp.int32, (ROW, ROW * SEG0), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (ROW, ROW * SEG0), 1)
    S = (j == c // SEG0).astype(jnp.float32)
    y = jnp.dot(x.astype(jnp.float32), S,
                preferred_element_type=jnp.float32)   # (NROWS, ROW*8)
    return y.astype(jnp.int32).reshape(P8_ROWS, ROW)


def phase5_build(block, moff, geo):
    """Level-0 packed content + lens planes (see phase5_core).

    Level-0 segments are 8-lane fields of a flat (P8_ROWS, ROW) plane
    (flat index = position * 8 + slot).
    """
    kept = geo["kept"]
    anchor = geo["anchor"]
    mstart = geo["mstart"]
    e = geo["e"]

    has_rem = anchor & (e >= 1)
    lit_off = jnp.where(anchor, 1 + jnp.minimum(e, 1), 0)
    t_off = lit_off + _i32(kept)

    # slot value planes in position space, then packed via expand8
    slot_vals = []
    for s in range(SEG0):
        val = jnp.zeros((NROWS, ROW), jnp.int32)
        val = jnp.where(anchor & (s == 0), geo["token"], val)
        val = jnp.where(has_rem & (s == 1), geo["litrem"], val)
        val = jnp.where(kept & (lit_off == s), block, val)
        val = jnp.where(mstart & (t_off == s), moff & 0xFF, val)
        val = jnp.where(mstart & (t_off + 1 == s), moff >> 8, val)
        val = jnp.where(geo["ml_ext"] & (t_off + 2 == s),
                        geo["mlc"] - 15, val)
        slot_vals.append(val)

    flat = (jax.lax.broadcasted_iota(jnp.int32, (P8_ROWS, ROW), 0) * ROW
            + jax.lax.broadcasted_iota(jnp.int32, (P8_ROWS, ROW), 1))
    slot_of = flat % SEG0
    content = jnp.zeros((P8_ROWS, ROW), jnp.int32)
    for s in range(SEG0):
        content = jnp.where(slot_of == s, expand8(slot_vals[s]), content)
    lens = expand8(geo["glen"])   # every lane of a field: its glen
    return content, lens


def phase5_core(block, moff, geo):
    """Packed hierarchical compaction: level-0 build + all merge steps.
    Each merge step shifts every right sibling left by
    (field_width - left_len) with pair-boundary masked flat shifts.
    As groups grow, their content bound (1.25 * positions + 12) falls
    ever further below the packed width, so the plane is NARROWED
    (8 -> 4 -> 2 lanes/position) between steps: the high steps — the
    bulk of the barrel-shift work — run on a plane 1/4 the size.
    Returns (CORE_ROWS, ROW) int32, one byte/element at flat [0, used).
    """
    content, lens = phase5_build(block, moff, geo)
    content, lens = phase5_stage1(content, lens)
    return phase5_stage2(content, lens)


N_STEPS = 16                      # merges: 2**16 positions of 8 -> 1
P5_MID_ROWS = P8_ROWS // 4        # 1024: plane rows after stage 1


def _merge_step(content, lens, g, max_llen):
    """One pairwise merge of adjacent groups of g lanes each.
    The right sibling moves left by (g - llen): one static shift by g,
    then a barrel shift RIGHT by llen (llen <= max_llen needs only
    log2(max_llen) steps — content of 2**k positions is
    <= 1.25*2**k + 12: each match covers >= 4 positions per <= 5
    injected bytes, <= 2 partials at group ends)."""
    R, C = content.shape
    flat = (jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) * C
            + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1))
    pw = 2 * g
    lp = flat % pw                # lane-in-pair
    in_left = lp < g
    llen = jnp.where(in_left, lens, shiftr_flat(lens, g))
    rlen = jnp.where(in_left, shiftl_flat(lens, g), lens)
    right_only = jnp.where(in_left, 0, content)
    left_only = jnp.where(in_left, content, 0)
    acc = shiftl_flat(right_only, g)      # content now at pair start
    bit = 1
    while bit <= max_llen:
        sh = shiftr_flat(acc, bit)
        sh = jnp.where(lp >= bit, sh, 0)  # keep within the pair
        acc = jnp.where((llen & bit) > 0, sh, acc)
        bit *= 2
    return left_only + acc, llen + rlen


def narrow_half(x):
    """Halve the packing width: keep the first 32 lanes of every
    64-lane field, (R, 128) -> (R/2, 128). Constructs: one wide
    reshape (row pairs side by side), masked static lane shifts, and
    a full-width prefix slice — all in the Mosaic-safe set
    (docs/PERFORMANCE.md probe list)."""
    R, C = x.shape
    y = x.reshape(R // 2, 2 * C)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R // 2, 2 * C), 1)
    acc = jnp.where(lane < 32, y, 0)
    for j in range(1, 4):
        part = _shift_left_lanes(y, 32 * j)
        acc = jnp.where((lane >= 32 * j) & (lane < 32 * (j + 1)),
                        part, acc)
    return acc[:, :C]


def _g_at(k):
    """Lanes per group of 2**k positions under the narrowing schedule:
    8 lanes/pos for steps 0-2, 4 for step 3, 2 from step 4 on."""
    if k < 3:
        return 8 << k
    if k == 3:
        return 4 << k
    return 2 << k


def phase5_stage1(content, lens):
    """Merge steps 0-3 with two narrows: (P8_ROWS, ROW) 8 lanes/pos ->
    (P5_MID_ROWS, ROW) 2 lanes/pos, groups of 16 positions. Content of
    2**k positions is <= 1.25*2**k + 12, so 4 lanes/pos suffices from
    k=3 (22 <= 32) and 2 lanes/pos from k=4 (32 <= 32... bound 27+12
    hmm: 1.25*16+12 = 32 <= 32 exactly)."""
    for k in range(3):
        g = _g_at(k)
        content, lens = _merge_step(content, lens, g,
                                    min(g, (5 << k) // 4 + 12))
    content = narrow_half(content)
    lens = narrow_half(lens)
    g = _g_at(3)
    content, lens = _merge_step(content, lens, g,
                                min(g, (5 << 3) // 4 + 12))
    content = narrow_half(content)
    lens = narrow_half(lens)
    return content, lens


def phase5_stage2(content, lens):
    """Merge steps 4-15 on the narrowed (P5_MID_ROWS, ROW) plane; the
    core bytes end at flat [0, core_used) — prefix rows are the core."""
    for k in range(4, N_STEPS):
        g = _g_at(k)
        content, lens = _merge_step(content, lens, g,
                                    min(g, (5 << k) // 4 + 12))
    return content[:CORE_ROWS]


# ---------------------------------------------------------------------------
# phase 6: gap expansion
# ---------------------------------------------------------------------------

def _roll_lanes(x, k):
    """Cyclic roll along axis 1 by k (left: lane c <- lane c+k)."""
    if k % x.shape[1] == 0:
        return x
    k = k % x.shape[1]
    return jnp.concatenate([x[:, k:], x[:, :k]], axis=1)


def _lane_bcast_max(x):
    """Every lane becomes its row's max (cyclic roll-max tree; exact for
    any width since max is idempotent). Values must be the quantity to
    broadcast OR a neutral smaller value."""
    C = x.shape[1]
    s = 1
    while s < C:
        x = jnp.maximum(x, _roll_lanes(x, s))
        s *= 2
    return x


def _barrel_roll_rows(x, amt):
    """Per-row cyclic left roll along lanes by amt (broadcast plane,
    values in [0, ROW))."""
    acc = x
    bit = 1
    while bit < ROW:
        rolled = _roll_lanes(acc, bit)
        acc = jnp.where((amt & bit) > 0, rolled, acc)
        bit *= 2
    return acc


def _widen(x, width):
    """Broadcast a lane-uniform (R, ROW) plane to (R, width)."""
    reps = -(-width // x.shape[1])
    return jnp.concatenate([x] * reps, axis=1)[:, :width]


def phase6_expand(core, geo):
    """Insert 255-run gaps. Returns (out plane (OUT_ROWS, ROW), used).

    Per source row there is at most one long-run anchor (runs >= 270
    bytes apart); per output row at most one gap intersects. All shapes
    stay full-lane (the target rejects (R,1)-shaped loops); per-row
    scalars live as lane-uniform broadcast planes, and the source-row ->
    output-row change of axis happens through one transpose of
    (NROWS, OUT_ROWS)-shaped broadcast planes.
    """
    lr = geo["long_run"]
    lr_i = _i32(lr)
    has_g = _lane_bcast_max(lr_i) > 0                       # (R, ROW)
    g_start = _lane_bcast_max(
        jnp.where(lr, geo["core_pos"] + 1 + geo["gap_before"], 0))
    g_len = _lane_bcast_max(jnp.where(lr, geo["gap255"], 0))
    s_pre = _lane_bcast_max(jnp.where(lr, geo["gap_before"], 0))
    BIG = jnp.int32(1 << 30)
    g_start = jnp.where(has_g, g_start, BIG)
    g_end = jnp.where(has_g, jnp.minimum(g_start + g_len, BIG), BIG)
    s_post = jnp.where(has_g, s_pre + g_len, 0)

    # change of axis: (NROWS, OUT_ROWS) lane-uniform planes -> transpose
    def to_out_lanes(x):
        return jnp.transpose(_widen(x, OUT_ROWS))           # (OR, NROWS)

    ge_b = to_out_lanes(g_end)
    gs_b = to_out_lanes(g_start)
    sp_b = to_out_lanes(s_post)
    spre_b = to_out_lanes(s_pre)

    rowstart = (jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS, NROWS), 0)
                * ROW)

    # prevailing shift at row start: s_post of the latest gap that ended
    # before the row (shifts are non-decreasing, so max == latest)
    done = ge_b <= rowstart
    s_base = _lane_bcast_max(jnp.where(done, sp_b, 0))
    inter = (gs_b < rowstart + ROW) & (ge_b > rowstart)
    row_gs = _lane_bcast_max(jnp.where(inter, gs_b, 0))
    row_ge = _lane_bcast_max(jnp.where(inter, ge_b, 0))
    row_spre = _lane_bcast_max(jnp.where(inter, spre_b, 0))
    row_spost = _lane_bcast_max(jnp.where(inter, sp_b, 0))
    has_inter = _lane_bcast_max(_i32(inter)) > 0
    sA = jnp.where(has_inter, row_spre, s_base)[:, :ROW]    # (OR, ROW)
    sB = jnp.where(has_inter, row_spost, s_base)[:, :ROW]
    row_gs = row_gs[:, :ROW]
    row_ge = row_ge[:, :ROW]
    has_inter = has_inter[:, :ROW]

    lane = jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS, ROW), 1)
    orow = jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS, ROW), 0)
    q = orow * ROW + lane

    def gather_rows(shift):
        """M[r] = core bytes at flat positions q - shift (per-row shift)."""
        src = orow * ROW - shift                            # (OR, ROW)
        cr = src // ROW
        a = src - cr * ROW                                  # 0..127
        crow = jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS, CORE_ROWS), 1)
        cr_w = _widen(cr, CORE_ROWS)
        R1 = (crow == cr_w).astype(jnp.float32)
        R2 = (crow == cr_w + 1).astype(jnp.float32)
        cf = core.astype(jnp.float32)
        G1 = jnp.dot(R1, cf, preferred_element_type=jnp.float32)
        G2 = jnp.dot(R2, cf, preferred_element_type=jnp.float32)
        r1 = _barrel_roll_rows(G1.astype(jnp.int32), a)
        r2 = _barrel_roll_rows(G2.astype(jnp.int32), a)
        return jnp.where(lane < ROW - a, r1, r2)

    MA = gather_rows(sA)
    MB = gather_rows(sB)
    in_gap = has_inter & (q >= row_gs) & (q < row_ge)
    pre = q < jnp.where(has_inter, row_gs, BIG)
    out = jnp.where(pre, MA, jnp.where(in_gap, 255, MB))
    used = geo["used"]
    out = jnp.where(q < used, out, 0)
    return out, used


# ---------------------------------------------------------------------------

def encode_block_planes(block, n, W=W_DEFAULT, tier_b=True):
    """Full pipeline on (NROWS, ROW) int32 byte plane.

    Returns (out plane (OUT_ROWS, ROW) int32 bytes, used scalar int32).
    XLA-level composition (outside Pallas): the tier-B sorts run as
    lax.sorts between the plane phases.
    """
    v = phase0_words(block)
    so = phase1_nearest_offset(v, n, W) if W else jnp.zeros_like(v)
    so8 = None
    extra = ()
    if tier_b:
        ns = jnp.asarray(n, jnp.int32).reshape(1)
        so8 = tier_b_candidates(v.reshape(1, BLOCK), ns)
        so8 = so8.reshape(NROWS, ROW)
        so4a, so4b = tier_b4_candidates(v.reshape(1, BLOCK), ns)
        extra = ((so4a.reshape(NROWS, ROW), 4),
                 (so4b.reshape(NROWS, ROW), 4))
    mlen, moff = phase2_lengths(so, n, so8, extra_planes=extra)
    is_start = phase3_parse(mlen)
    geo = phase4_geometry(mlen, moff, is_start, n)
    core = phase5_core(block, moff, geo)

    # gap expansion is needed only when some literal run reaches the
    # 255-extension regime (>= LONG_LIT); most blocks have none, and the
    # expansion's row-gather matmuls + barrel rolls are the third most
    # expensive stage (tools/profile_lz4_slopes.py)
    has_gap = jnp.max(_i32(geo["long_run"])) > 0

    def expand(_):
        return phase6_expand(core, geo)

    def passthrough(_):
        pad = jnp.zeros((OUT_ROWS - CORE_ROWS, ROW), jnp.int32)
        return jnp.concatenate([core, pad], axis=0), geo["used"]

    return jax.lax.cond(has_gap, expand, passthrough, None)
