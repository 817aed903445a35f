"""LZ4 raw block codec — data-parallel design.

Format (behavioral reference: C/lz4/lz4.c LZ4_compress_generic /
LZ4_decompress_generic; format doc lz4_Block_format):
  sequence := token(1) [litlen-ext 255*] literals [offset u16le]
              [matchlen-ext 255*]
  token    := (litlen:4 | matchlen-4:4), 15 in a nibble => extension bytes
  rules    := min match 4; offset in [1, 0xFFFF]; last 5 bytes are literals;
              a match must not start within the last 12 bytes.

TPU-first redesign (nothing like the reference's byte-serial loop):
  1. hash every position's 4-byte window at once,
  2. previous-occurrence candidates via a stable sort over (hash, pos) —
     the data-parallel equivalent of LZ4's "most recent head" hash table,
  3. exact match lengths by widening vectorized compares,
  4. greedy parse via pointer-doubling over next[] (log2 n gather passes)
     instead of the loop-carried cursor,
  5. variable-length token emission via prefix-sum + scatter.
Steps 1-4 are pure array ops and map 1:1 onto the jax/Pallas device path
(tpu7z.ops.lz4_kernels); this module is the numpy bit-exact twin.
"""

from __future__ import annotations

import numpy as np

from ...utils.errors import CorruptError

MIN_MATCH = 4
MF_LIMIT = 12      # match must not start within last 12 bytes
LAST_LITERALS = 5  # last 5 bytes are always literals
MAX_OFFSET = 0xFFFF
_HASH_MULT = np.uint32(2654435761)


def max_compressed_size(n: int) -> int:
    """Worst-case compressed size (LZ4_compressBound semantics)."""
    return n + n // 255 + 16


# ---------------------------------------------------------------------------
# Decompression
# ---------------------------------------------------------------------------

def decompress_block(src, dst_size: int | None = None,
                     cap_hint: int | None = None) -> bytes:
    """Decode one raw LZ4 block. Sequence-serial host loop with vectorized
    literal/match copies (match copy uses the period trick for overlaps).

    dst_size: exact decoded size when known (native fast path, size
    enforced).  cap_hint: upper bound only (e.g. the frame's block size);
    the native tier decodes into that capacity and returns the actual
    length.
    """
    s = np.frombuffer(bytes(src), dtype=np.uint8)
    n = s.size
    cap = dst_size if dst_size is not None else _decoded_bound(n)
    if dst_size is not None or cap_hint is not None:
        try:
            from ... import native as _native_mod
            lib = _native_mod._load()
        except Exception:
            lib = None
        if lib is not None:
            import ctypes
            want = dst_size if dst_size is not None else cap_hint
            buf = ctypes.create_string_buffer(want)
            r = lib.tz_lz4_decode(bytes(src), n, buf, want)
            if r < 0 or (dst_size is not None and r != dst_size):
                raise CorruptError(f"lz4: decoded {r}, expected {want}")
            return buf.raw[:r]
    out = np.empty(cap, dtype=np.uint8)
    ip = 0
    op = 0
    while ip < n:
        token = int(s[ip]); ip += 1
        litlen = token >> 4
        if litlen == 15:
            while True:
                if ip >= n:
                    raise CorruptError("lz4: truncated literal length")
                b = int(s[ip]); ip += 1
                litlen += b
                if b != 255:
                    break
        if ip + litlen > n:
            raise CorruptError("lz4: literal run past input end")
        if op + litlen > cap:
            raise CorruptError("lz4: output overflow (literals)")
        out[op:op + litlen] = s[ip:ip + litlen]
        ip += litlen
        op += litlen
        if ip == n:
            break  # last sequence has no match part
        if ip + 2 > n:
            raise CorruptError("lz4: truncated offset")
        offset = int(s[ip]) | (int(s[ip + 1]) << 8)
        ip += 2
        if offset == 0 or offset > op:
            raise CorruptError("lz4: invalid offset")
        mlen = (token & 15) + MIN_MATCH
        if (token & 15) == 15:
            while True:
                if ip >= n:
                    raise CorruptError("lz4: truncated match length")
                b = int(s[ip]); ip += 1
                mlen += b
                if b != 255:
                    break
        if op + mlen > cap:
            raise CorruptError("lz4: output overflow (match)")
        start = op - offset
        if offset >= mlen:
            out[op:op + mlen] = out[start:start + mlen]
        else:
            # overlapping copy: output repeats with period `offset`
            period = out[start:start + offset]
            reps = -(-mlen // offset)
            out[op:op + mlen] = np.tile(period, reps)[:mlen]
        op += mlen
    if dst_size is not None and op != dst_size:
        raise CorruptError(f"lz4: decoded {op} bytes, expected {dst_size}")
    return out[:op].tobytes()


def _decoded_bound(n: int) -> int:
    # Without a declared size, bound output; max expansion is 255x per ext
    return max(64, n * 255)


# ---------------------------------------------------------------------------
# Compression
# ---------------------------------------------------------------------------

def _u32_at(s: np.ndarray) -> np.ndarray:
    """Little-endian u32 read at every position (len n-3)."""
    n = s.size
    v = (s[: n - 3].astype(np.uint32)
         | (s[1: n - 2].astype(np.uint32) << np.uint32(8))
         | (s[2: n - 1].astype(np.uint32) << np.uint32(16))
         | (s[3: n].astype(np.uint32) << np.uint32(24)))
    return v


def _find_candidates(s: np.ndarray, hashlog: int = 16) -> np.ndarray:
    """cand[p] = most recent q < p whose 4-byte hash equals p's, else -1.

    Data-parallel hash chain of depth 1: stable argsort by hash; within a
    hash bucket positions appear in increasing order, so the sorted
    predecessor is exactly the most recent previous occurrence.
    """
    v = _u32_at(s)
    h = ((v * _HASH_MULT) >> np.uint32(32 - hashlog)).astype(np.uint32)
    order = np.argsort(h, kind="stable")
    sh = h[order]
    cand = np.full(v.size, -1, dtype=np.int64)
    same = np.empty(order.size, dtype=bool)
    if order.size:
        same[0] = False
        same[1:] = sh[1:] == sh[:-1]
        prev = np.empty_like(order)
        prev[1:] = order[:-1]
        prev[0] = -1
        cand[order[same]] = prev[same]
    # verify actual 4-byte equality (hash collisions)
    ok = cand >= 0
    idx = np.where(ok)[0]
    ok[idx] = v[idx] == v[cand[idx]]
    cand[~ok] = -1
    return cand


def _find_candidates_multi(s: np.ndarray, hashlog: int = 16,
                           depth: int = 2) -> list[np.ndarray]:
    """Depth-k chain: cand_d[p] = d-th most recent q < p with p's hash.
    One stable sort; deeper candidates are earlier sorted neighbors."""
    v = _u32_at(s)
    h = ((v * _HASH_MULT) >> np.uint32(32 - hashlog)).astype(np.uint32)
    order = np.argsort(h, kind="stable")
    sh = h[order]
    out = []
    for d in range(1, depth + 1):
        cand = np.full(v.size, -1, dtype=np.int64)
        if order.size > d:
            same = sh[d:] == sh[:-d]
            cand[order[d:][same]] = order[:-d][same]
        ok = cand >= 0
        idx = np.where(ok)[0]
        ok[idx] = v[idx] == v[cand[idx]]
        cand[~ok] = -1
        out.append(cand)
    return out


def _match_lengths(s: np.ndarray, pos: np.ndarray, cand: np.ndarray,
                   limit: np.ndarray) -> np.ndarray:
    """Exact common-prefix length of s[pos:] vs s[cand:], starting from a
    verified 4-byte match, capped elementwise by `limit`.

    Widening passes: compare 16-byte panels; survivors (fully equal panels)
    get another pass. Work per pass shrinks geometrically.
    """
    n = s.size
    mlen = np.full(pos.size, MIN_MATCH, dtype=np.int64)
    active = np.arange(pos.size)
    depth = MIN_MATCH
    W = 16  # widens geometrically: long runs converge in log passes
    while active.size:
        a = pos[active] + mlen[active]
        b = cand[active] + mlen[active]
        span = np.minimum(np.int64(W), limit[active] - mlen[active])
        span = np.maximum(span, 0)
        # gather W-byte panels (clamped to array end)
        offs = np.arange(W)
        ai = np.minimum(a[:, None] + offs, n - 1)
        bi = np.minimum(b[:, None] + offs, n - 1)
        eq = (s[ai] == s[bi])
        # positions beyond span count as mismatch
        eq &= offs[None, :] < span[:, None]
        # first mismatch per row
        any_mis = ~eq.all(axis=1)
        first_mis = np.where(any_mis, np.argmin(eq, axis=1), span)
        mlen[active] += first_mis
        # continue only rows that matched the full W panel and have room
        cont = (~any_mis) & (span == W) & (mlen[active] < limit[active])
        active = active[cont]
        depth += W
        # widen geometrically, but keep the gather panel under a fixed
        # memory budget (active_rows x W indices)
        budget = 4_000_000
        W = min(W * 2, 8192, max(16, budget // max(int(active.size), 1)))
        if depth > n:
            break
    return mlen


_POLY_A = np.uint64(0x9E3779B97F4A7C15) | np.uint64(1)


def build_prefix_hash(s: np.ndarray):
    """(H, APOW) for O(1) substring hashes: H[i] = hash of s[:i] under the
    polynomial rolling hash h*a + (byte+1) mod 2^64;
    hash(s[i:i+L]) = H[i+L] - H[i]*APOW[L]."""
    n = s.size
    apow = np.empty(n + 1, dtype=np.uint64)
    apow[0] = 1
    np.multiply.accumulate(np.full(n, _POLY_A, dtype=np.uint64),
                           out=apow[1:])
    h = np.empty(n + 1, dtype=np.uint64)
    h[0] = 0
    # H[i+1] = H[i]*a + s[i]+1  =>  H[k] = sum_{i<k} (s[i]+1)*a^(k-1-i)
    # computed as cumsum of (s[i]+1)*a^(-i) ... avoid division: instead
    # accumulate in the scaled domain: T[k] = sum (s[i]+1) * a^(N-1-i),
    # then H[k] = T[k] / a^(N-k) — division again. Use a sequential-free
    # form: (s[i]+1)*apow reversed prefix via cumsum of terms with
    # descending powers, then multiply by ascending powers:
    # H[k] * apow[n-k] = cumsum_k((s[i]+1)*apow[n-1-i]); a is odd so
    # apow[n-k] is invertible mod 2^64.
    terms = (s.astype(np.uint64) + np.uint64(1)) * apow[n - 1::-1]
    csum = np.zeros(n + 1, dtype=np.uint64)
    np.add.accumulate(terms, out=csum[1:])
    inv_a = _modinv_pow2(_POLY_A)
    inv_pow = np.empty(n + 1, dtype=np.uint64)
    inv_pow[0] = 1
    np.multiply.accumulate(np.full(n, inv_a, dtype=np.uint64),
                           out=inv_pow[1:])
    h = csum * inv_pow[n::-1]
    return h, apow


def _modinv_pow2(a: np.uint64) -> np.uint64:
    """Inverse of odd a mod 2^64 (Newton iteration over Python ints)."""
    ai = int(a)
    x = ai
    for _ in range(5):
        x = (x * (2 - ai * x)) & 0xFFFFFFFFFFFFFFFF
    return np.uint64(x)


def match_lengths_hashed(prefix_hash, pos: np.ndarray, cand: np.ndarray,
                         limit: np.ndarray,
                         verified: int = MIN_MATCH) -> np.ndarray:
    """Common-prefix length of s[pos:] vs s[cand:] (first `verified` bytes
    already known equal), elementwise-capped by `limit`, via vectorized
    binary search over O(1) rolling-hash substring compares. Replaces the
    widening-compare loop for long-window parses where match lengths can
    reach megabytes (collision odds ~ pairs * 2^-64)."""
    h, apow = prefix_hash
    lo = np.minimum(np.int64(verified), limit).astype(np.int64)
    hi = limit.astype(np.int64)
    hp = h[pos]
    hc = h[cand]

    def _eq(idx, ln):
        return (h[pos[idx] + ln] - hp[idx] * apow[ln]
                == h[cand[idx] + ln] - hc[idx] * apow[ln])

    # gallop: doubling probes bracket the mismatch so the (dominant)
    # short matches finish in a probe or two; active set shrinks
    # geometrically, like the byte-panel widening pass but O(1)/probe
    step = np.full(pos.size, 8, dtype=np.int64)
    active = np.where(lo < hi)[0]
    while active.size:
        probe = np.minimum(lo[active] + step[active], hi[active])
        eq = _eq(active, probe)
        lo[active] = np.where(eq, probe, lo[active])
        hi[active] = np.where(eq, hi[active], probe - 1)
        step[active] <<= 1
        active = active[eq & (lo[active] < hi[active])]
    # binary refine within the bracket
    active = np.where(lo < hi)[0]
    while active.size:
        mid = lo[active] + (hi[active] - lo[active] + 1) // 2
        eq = _eq(active, mid)
        lo[active] = np.where(eq, mid, lo[active])
        hi[active] = np.where(eq, hi[active], mid - 1)
        active = active[lo[active] < hi[active]]
    return lo


def _greedy_parse(next_pos: np.ndarray, n: int) -> np.ndarray:
    """Positions visited starting at 0 following next_pos, via pointer
    doubling (replaces the sequential cursor of LZ4_compress_generic)."""
    sentinel = n
    nxt = np.minimum(next_pos, sentinel)
    visited = np.array([0], dtype=np.int64)
    jump = nxt
    steps = 1
    while steps < n + 1:
        ext = jump[np.minimum(visited, n - 1)]
        ext = np.where(visited >= n, sentinel, ext)
        visited = np.unique(np.concatenate([visited, ext]))
        j2 = jump[np.minimum(jump, n - 1)]
        jump = np.where(jump >= n, sentinel, j2)
        steps *= 2
    return visited[visited < n]


def compress_block(src, accel: int = 1, hashlog: int = 16,
                   use_native: bool = True) -> bytes:
    """Greedy LZ4 block compression.

    Host fast path: the C++ greedy encoder in tpu7z/native (284 MB/s,
    the CPU tier — reference analog C/lz4/lz4.c LZ4_compress_default).
    Fallback / use_native=False: the fully data-parallel numpy parse
    (the host twin of the device plane pipeline in ops/lz4_plane.py).
    """
    if use_native and accel == 1 and hashlog == 16 and len(src) > 0:
        try:
            from ... import native as _native_mod
            import ctypes as _ct
            lib = _native_mod._load()
        except Exception:
            lib = None
        if lib is not None:
            raw = bytes(src)
            cap = len(raw) + len(raw) // 255 + 64
            buf = _ct.create_string_buffer(cap)
            r = lib.tz_lz4_encode(raw, len(raw), buf, cap)
            if r > 0:
                return buf.raw[:r]
    s = np.frombuffer(bytes(src), dtype=np.uint8)
    n = s.size
    if n == 0:
        return b"\x00"
    if n < MF_LIMIT + 1:
        return _emit_all_literal(s)

    cand = _find_candidates(s, hashlog=hashlog)
    pos_all = np.arange(cand.size, dtype=np.int64)
    offset = pos_all - cand
    valid = (cand >= 0) & (offset <= MAX_OFFSET) & (pos_all <= n - MF_LIMIT - 1)

    # match length cap: match may extend at most to n - LAST_LITERALS
    limit = np.full(cand.size, 0, dtype=np.int64)
    limit[valid] = (n - LAST_LITERALS) - pos_all[valid]
    mlen = np.zeros(cand.size, dtype=np.int64)
    vidx = np.where(valid)[0]
    if vidx.size:
        ml = _match_lengths(s, pos_all[vidx], cand[vidx], limit[vidx])
        mlen[vidx] = ml
    valid &= mlen >= MIN_MATCH

    # next position after taking the match (or skipping one literal byte)
    next_pos = np.where(valid, pos_all + mlen, pos_all + 1)
    full_next = np.full(n, n, dtype=np.int64)
    full_next[: next_pos.size] = next_pos

    visited = _greedy_parse(full_next, n)
    is_match = np.zeros(n, dtype=bool)
    vm = np.zeros(n, dtype=np.int64)
    voff = np.zeros(n, dtype=np.int64)
    is_match[: valid.size] = valid
    vm[: mlen.size] = mlen
    voff[: offset.size] = offset
    m_sel = visited[is_match[visited]]

    return _emit_sequences(s, m_sel, vm[m_sel], voff[m_sel])


def compress_block_continuation(chunk, window, hashlog: int = 16) -> bytes:
    """Greedy LZ4 compression of `chunk` with `window` (up to the
    preceding 64KB of already-encoded data) as match history — the
    linked-blocks mode of the frame format (C/lz4/lz4frame.c blockMode
    LZ4F_blockLinked). Matches may reach back into the window; output
    encodes only `chunk`."""
    if hashlog == 16 and len(chunk) > 0:
        try:
            from ... import native as _native_mod
            import ctypes as _ct
            lib = _native_mod._load()
        except Exception:
            lib = None
        if lib is not None:
            s = bytes(window) + bytes(chunk)
            cap = len(chunk) + len(chunk) // 128 + 64
            dst = _ct.create_string_buffer(cap)
            r = lib.tz_lz4_encode_region(s, len(s), len(window), dst, cap)
            if r > 0:
                return dst.raw[:r]
    w = np.frombuffer(bytes(window), dtype=np.uint8)
    c = np.frombuffer(bytes(chunk), dtype=np.uint8)
    if c.size == 0:
        return b"\x00"
    s = np.concatenate([w, c])
    w0 = w.size
    n = s.size
    if c.size < MF_LIMIT + 1:
        return _emit_sequences_from(s, w0, np.empty(0, np.int64),
                                    np.empty(0, np.int64),
                                    np.empty(0, np.int64))

    cand = _find_candidates(s, hashlog=hashlog)
    pos_all = np.arange(cand.size, dtype=np.int64)
    offset = pos_all - cand
    valid = ((cand >= 0) & (offset <= MAX_OFFSET)
             & (pos_all >= w0) & (pos_all <= n - MF_LIMIT - 1))

    limit = np.zeros(cand.size, dtype=np.int64)
    limit[valid] = (n - LAST_LITERALS) - pos_all[valid]
    mlen = np.zeros(cand.size, dtype=np.int64)
    vidx = np.where(valid)[0]
    if vidx.size:
        mlen[vidx] = _match_lengths(s, pos_all[vidx], cand[vidx],
                                    limit[vidx])
    valid &= mlen >= MIN_MATCH

    next_pos = np.where(valid, pos_all + mlen, pos_all + 1)
    full_next = np.full(n, n, dtype=np.int64)
    full_next[: next_pos.size] = next_pos
    # walk from w0 instead of 0: shift the jump table into chunk space
    visited = _greedy_parse(
        np.concatenate([full_next[w0:] - w0,
                        np.full(w0, n - w0, np.int64)]), n - w0) + w0
    is_match = np.zeros(n, dtype=bool)
    vm = np.zeros(n, dtype=np.int64)
    voff = np.zeros(n, dtype=np.int64)
    is_match[: valid.size] = valid
    vm[: mlen.size] = mlen
    voff[: offset.size] = offset
    m_sel = visited[is_match[visited]]
    return _emit_sequences_from(s, w0, m_sel, vm[m_sel], voff[m_sel])


def _emit_sequences_from(s: np.ndarray, w0: int, mpos, mlen, moff) -> bytes:
    """_emit_sequences with literals starting at s[w0] (window prefix
    excluded from the output)."""
    return _emit_sequences(s[w0:], mpos - w0, mlen, moff)


def merge_adjacent_matches(mpos: np.ndarray, mlen: np.ndarray,
                           moff: np.ndarray):
    """Merge chains of matches where one ends exactly where the next
    starts with the same offset. The device match finder caps lengths at
    ops.match_jax.ML_CAP; merging restores arbitrarily long matches."""
    k = mpos.size
    if k == 0:
        return mpos, mlen, moff
    joins = (mpos[1:] == mpos[:-1] + mlen[:-1]) & (moff[1:] == moff[:-1])
    # group id increments where a new chain starts
    group = np.concatenate([[0], np.cumsum(~joins)])
    starts = np.full(int(group[-1]) + 1, k, dtype=np.int64)
    np.minimum.at(starts, group, np.arange(k))
    first = starts  # index of first match in each group
    total = np.zeros(first.size, dtype=np.int64)
    np.add.at(total, group, mlen)
    return mpos[first], total, moff[first]


def _emit_all_literal(s: np.ndarray) -> bytes:
    return _emit_sequences(s, np.empty(0, np.int64), np.empty(0, np.int64),
                           np.empty(0, np.int64))


def _lsic_count(x: np.ndarray) -> np.ndarray:
    """Number of extension bytes for a length value already >= 15."""
    return (x - 15) // 255 + 1


def _emit_sequences(s: np.ndarray, mpos: np.ndarray, mlen: np.ndarray,
                    moff: np.ndarray) -> bytes:
    """Serialize sequences: matches at mpos (sorted), literals in gaps,
    trailing literal-only sequence. Vectorized via per-sequence size
    computation, prefix-sum placement and grouped scatters.
    """
    n = s.size
    k = mpos.size
    # literal run start for sequence i = end of previous match
    lit_start = np.empty(k + 1, dtype=np.int64)
    lit_start[0] = 0
    if k:
        lit_start[1:] = mpos + mlen
    lit_len = np.empty(k + 1, dtype=np.int64)
    lit_len[:k] = mpos - lit_start[:k]
    lit_len[k] = n - lit_start[k]

    tok_lit = np.minimum(lit_len, 15)
    lit_ext = np.where(lit_len >= 15, _lsic_count(lit_len), 0)
    ml_code = np.zeros(k + 1, dtype=np.int64)
    ml_ext = np.zeros(k + 1, dtype=np.int64)
    if k:
        mcode = mlen - MIN_MATCH
        ml_code[:k] = np.minimum(mcode, 15)
        ml_ext[:k] = np.where(mcode >= 15, _lsic_count(mcode), 0)

    has_match = np.zeros(k + 1, dtype=np.int64)
    has_match[:k] = 1
    seq_size = 1 + lit_ext + lit_len + has_match * 2 + ml_ext
    seq_off = np.concatenate([[0], np.cumsum(seq_size)])
    total = int(seq_off[-1])
    out = np.zeros(total, dtype=np.uint8)

    # tokens
    out[seq_off[:-1]] = ((tok_lit << 4) | ml_code).astype(np.uint8)

    # literal-length extension bytes: lit_ext[i] bytes after the token;
    # all are 255 except the last, which is (lit_len-15) % 255
    _scatter_ext(out, seq_off[:-1] + 1, lit_ext, lit_len - 15)

    # literals
    lit_dst = seq_off[:-1] + 1 + lit_ext
    _scatter_runs(out, lit_dst, s, lit_start, lit_len)

    if k:
        # offsets (u16le) after the literals
        off_dst = (lit_dst + lit_len)[:k]
        out[off_dst] = (moff & 0xFF).astype(np.uint8)
        out[off_dst + 1] = (moff >> 8).astype(np.uint8)
        # match length extension bytes
        _scatter_ext(out, off_dst + 2, ml_ext[:k], (mlen - MIN_MATCH) - 15)
    return out.tobytes()


def _scatter_ext(out: np.ndarray, dst: np.ndarray, count: np.ndarray,
                 rem_value: np.ndarray) -> None:
    """Write `count[i]` extension bytes at dst[i]: (count-1) bytes of 255
    then rem_value[i] % 255 ... per LZ4's LSIC: value v >= 15 encodes as
    255 repeated (v-15)//255 times, then (v-15)%255.
    """
    sel = np.where(count > 0)[0]
    if sel.size == 0:
        return
    cnt = count[sel]
    starts = dst[sel]
    rem = rem_value[sel] % 255
    total = int(cnt.sum())
    # destination indices: for each i, starts[i] + [0..cnt[i])
    reps = np.repeat(starts, cnt)
    within = np.arange(total) - np.repeat(np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt)
    idx = reps + within
    vals = np.full(total, 255, dtype=np.uint8)
    last_pos = np.cumsum(cnt) - 1
    vals[last_pos] = rem.astype(np.uint8)
    out[idx] = vals


def _scatter_runs(out: np.ndarray, dst: np.ndarray, src: np.ndarray,
                  src_start: np.ndarray, length: np.ndarray) -> None:
    """Copy src[src_start[i] : +length[i]] to out[dst[i] : +length[i]]."""
    sel = np.where(length > 0)[0]
    if sel.size == 0:
        return
    ln = length[sel]
    total = int(ln.sum())
    base = np.concatenate([[0], np.cumsum(ln)[:-1]])
    within = np.arange(total) - np.repeat(base, ln)
    out[np.repeat(dst[sel], ln) + within] = src[np.repeat(src_start[sel], ln) + within]
