"""Device-side LZ4 token emission.

Completes the on-device encode pipeline: find_matches (match_jax) gives
(selected, mlen, moff); this kernel serializes the LZ4 sequences entirely
with fixed-shape gathers/scatters, so compressed bytes are produced in
HBM — host transfer is only the (compressed) output. The variable-length
writes are expressed as prefix sums + jnp.repeat(total_repeat_length=...)
with a sentinel slot absorbing the static-shape slack; invalid lanes
write to a trash cell past the buffers.

Serial-equivalent: models/lz4/block.py _emit_sequences (numpy twin).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MIN_MATCH = 4


def buf_size(n: int) -> int:
    return n + n // 255 + 128


def _lsic_ext(lit_len):
    """Number of LSIC extension bytes for a length field."""
    return jnp.where(lit_len >= 15, (lit_len - 15) // 255 + 1, 0)


@functools.partial(jax.jit, static_argnames=("N",))
def emit_blocks(blocks, lengths, sel, mlen, moff, *, N: int):
    """Serialize LZ4 blocks on device.

    blocks (B,N) u8; lengths (B,); sel (B,N) bool; mlen/moff (B,N) i32.
    Returns (out_flat ((B*BUF+1,) u8), used (B,) i32); block b's bytes are
    out_flat[b*BUF : b*BUF + used[b]].
    """
    B = blocks.shape[0]
    M = N // MIN_MATCH + 1  # max matches + final literal slot
    BUF = buf_size(N)
    TRASH = B * BUF  # one trash cell at the very end

    n_b = lengths.astype(jnp.int32)  # (B,)
    pos = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))

    # --- gather matches into slots (ascending position) ---
    order = jnp.argsort(~sel, axis=1, stable=True).astype(jnp.int32)[:, :M]
    k = jnp.sum(sel, axis=1).astype(jnp.int32)  # (B,)
    slot = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (B, M))
    is_m = slot < k[:, None]                      # match slots
    is_fin = slot == k[:, None]                   # final literal slot
    active = is_m | is_fin

    p = jnp.where(is_m, jnp.take_along_axis(
        jnp.broadcast_to(pos, (B, N)), order, axis=1), n_b[:, None])
    l = jnp.where(is_m, jnp.take_along_axis(mlen, order, axis=1), 0)
    o = jnp.where(is_m, jnp.take_along_axis(moff, order, axis=1), 0)

    # --- merge chains of adjacent same-offset matches (the device match
    # finder caps lengths at match_jax.ML_CAP; merged slots emit one
    # sequence with the summed length, continuation slots emit nothing) ---
    prev_p = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32),
                              p[:, :-1]], axis=1)
    prev_l = jnp.concatenate([jnp.zeros((B, 1), jnp.int32),
                              l[:, :-1]], axis=1)
    prev_o = jnp.concatenate([jnp.zeros((B, 1), jnp.int32),
                              o[:, :-1]], axis=1)
    prev_im = jnp.concatenate([jnp.zeros((B, 1), bool),
                               is_m[:, :-1]], axis=1)
    join = is_m & prev_im & (p == prev_p + prev_l) & (o == prev_o)
    grp = jnp.cumsum(~join, axis=1) - 1  # group id per slot (within row)
    bidx_m = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, M))
    gsum = jnp.zeros((B, M), jnp.int32).at[bidx_m, grp].add(
        jnp.where(is_m, l, 0))
    l_merged = jnp.take_along_axis(gsum, grp, axis=1)
    is_start = is_m & ~join

    prev_end = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), (p + l)[:, :-1]], axis=1)
    lit_start = prev_end
    lit_len = jnp.where(is_start, p - prev_end,
                        jnp.where(is_fin, n_b[:, None] - prev_end, 0))
    active = is_start | is_fin
    is_m = is_start

    lit_ext = jnp.where(active, _lsic_ext(lit_len), 0)
    mlc = jnp.where(is_start, jnp.maximum(l_merged - MIN_MATCH, 0), 0)
    ml_ext = jnp.where(is_m, _lsic_ext(mlc), 0)

    size = (jnp.where(active, 1 + lit_ext + lit_len, 0)
            + jnp.where(is_m, 2 + ml_ext, 0))
    off_in_row = jnp.cumsum(size, axis=1) - size  # exclusive prefix
    used = jnp.sum(size, axis=1).astype(jnp.int32)

    row_base = (jnp.arange(B, dtype=jnp.int32) * BUF)[:, None]
    dst0 = row_base + off_in_row  # token byte position (B, M)

    out = jnp.zeros(B * BUF + 1, dtype=jnp.uint8)

    # --- token bytes ---
    tok = ((jnp.minimum(lit_len, 15) << 4)
           | jnp.where(is_m, jnp.minimum(mlc, 15), 0)).astype(jnp.uint8)
    tok_idx = jnp.where(active, dst0, TRASH).reshape(-1)
    out = out.at[tok_idx].set(tok.reshape(-1), mode="drop")

    T_EXT = B * (N // 4 + N // 255 + 64)
    # --- literal-length extension bytes ---
    out = _scatter_ext(out, (dst0 + 1).reshape(-1), lit_ext.reshape(-1),
                       (lit_len - 15).reshape(-1), T_EXT, TRASH)

    # --- literals ---
    lit_dst = dst0 + 1 + lit_ext
    blk_flat = blocks.reshape(-1)
    lit_src = (jnp.arange(B, dtype=jnp.int32) * N)[:, None] + lit_start
    out = _scatter_copy(out, blk_flat, lit_dst.reshape(-1),
                        lit_src.reshape(-1), lit_len.reshape(-1),
                        B * N + 64, TRASH)

    # --- offsets (u16le) ---
    off_dst = lit_dst + lit_len
    off_idx = jnp.where(is_m, off_dst, TRASH).reshape(-1)
    out = out.at[off_idx].set((o & 0xFF).astype(jnp.uint8).reshape(-1),
                              mode="drop")
    off_idx2 = jnp.where(is_m, off_dst + 1, TRASH).reshape(-1)
    out = out.at[off_idx2].set((o >> 8).astype(jnp.uint8).reshape(-1),
                               mode="drop")

    # --- match-length extension bytes ---
    out = _scatter_ext(out, (off_dst + 2).reshape(-1), ml_ext.reshape(-1),
                       (mlc - 15).reshape(-1), T_EXT, TRASH)
    return out, used


def _scatter_ext(out, dst_start, count, rem_minus, T, TRASH):
    """Write `count[s]` LSIC bytes at dst_start[s]: 255 repeated, last =
    rem_minus[s] % 255 (rem_minus = value-15)."""
    K = dst_start.shape[0]
    total = jnp.sum(count)
    counts2 = jnp.concatenate([count, (T - total)[None]])
    dst2 = jnp.concatenate([dst_start, jnp.asarray([TRASH], jnp.int32)])
    prefix = jnp.cumsum(counts2) - counts2
    sid = jnp.repeat(jnp.arange(K + 1, dtype=jnp.int32), counts2,
                     total_repeat_length=T)
    within = jnp.arange(T, dtype=jnp.int32) - prefix[sid]
    dst = jnp.minimum(dst2[sid] + within, TRASH)
    is_last = within == (counts2[sid] - 1)
    rem2 = jnp.concatenate([rem_minus % 255, jnp.asarray([0], jnp.int32)])
    vals = jnp.where(is_last, rem2[sid], 255).astype(jnp.uint8)
    return out.at[dst].set(vals, mode="drop")


def _scatter_copy(out, src_flat, dst_start, src_start, count, T, TRASH):
    K = dst_start.shape[0]
    total = jnp.sum(count)
    counts2 = jnp.concatenate([count, (T - total)[None]])
    dst2 = jnp.concatenate([dst_start, jnp.asarray([TRASH], jnp.int32)])
    src2 = jnp.concatenate([src_start, jnp.asarray([0], jnp.int32)])
    prefix = jnp.cumsum(counts2) - counts2
    sid = jnp.repeat(jnp.arange(K + 1, dtype=jnp.int32), counts2,
                     total_repeat_length=T)
    within = jnp.arange(T, dtype=jnp.int32) - prefix[sid]
    dst = jnp.minimum(dst2[sid] + within, TRASH)
    src = jnp.clip(src2[sid] + within, 0, src_flat.shape[0] - 1)
    return out.at[dst].set(src_flat[src], mode="drop")
