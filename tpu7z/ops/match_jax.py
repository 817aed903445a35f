"""Device (JAX/XLA) match-finding + greedy-parse kernels.

This is the TPU hot path for LZ77-family encoders (LZ4, zstd fast levels):
the numpy twins live in models/lz4/block.py. Replaces the reference's
byte-serial cursor loops (C/lz4/lz4.c LZ4_compress_generic,
C/zstd/zstd_fast.c) with a batch design:

  hash all positions -> stable sort  (radix pass, FLZMA2 model:
                                     C/fast-lzma2/radix_mf.c)
  -> previous-occurrence candidates  (sorted-neighbor gather)
  -> match lengths                   (fixed widening compare passes)
  -> greedy parse                    (pointer-doubling reachability)

Everything is fixed-shape, batched over blocks, and jit-compiles to a
handful of sorts/gathers/scatters — XLA maps these onto the VPU; the
sort rides XLA's optimized TPU sort. Match lengths cap at ML_CAP on
device; the host emitter merges adjacent same-offset matches, which
restores long-run compression without data-dependent device loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

HASH_MULT = np.uint32(2654435761)
ML_CAP = 4 + 16 * 8  # device match-length cap (merged at emission)


@functools.partial(jax.jit, static_argnames=("hashlog", "max_offset",
                                             "min_match", "tail_guard"))
def find_matches(blocks: jax.Array, lengths: jax.Array, hashlog: int = 16,
                 max_offset: int = 65535, min_match: int = 4,
                 tail_guard: int = 12):
    """Batched match finding + greedy parse.

    blocks: (B, N) uint8, zero-padded; lengths: (B,) actual block sizes.
    Returns (selected, mlen, moff): (B, N) arrays — selected[b, p] True
    where the greedy parse takes a match at p, with its length/offset.
    """
    B, N = blocks.shape
    u8 = blocks.astype(jnp.uint32)
    # 4-byte little-endian value at each position (clamped tail)
    v = (u8
         | (jnp.roll(u8, -1, axis=1) << 8)
         | (jnp.roll(u8, -2, axis=1) << 16)
         | (jnp.roll(u8, -3, axis=1) << 24))
    h = ((v * HASH_MULT) >> np.uint32(32 - hashlog)).astype(jnp.uint32)

    pos = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    in_range = pos < jnp.maximum(lengths[:, None] - 3, 0)
    # out-of-range positions get a sentinel hash so they sort to the end
    h = jnp.where(in_range, h, jnp.uint32((1 << hashlog)))

    order = jnp.argsort(h, axis=1, stable=True).astype(jnp.int32)
    sh = jnp.take_along_axis(h, order, axis=1)
    same = jnp.concatenate(
        [jnp.zeros((B, 1), dtype=bool), sh[:, 1:] == sh[:, :-1]], axis=1)
    prev_sorted = jnp.concatenate(
        [jnp.zeros((B, 1), dtype=jnp.int32), order[:, :-1]], axis=1)
    cand_val = jnp.where(same, prev_sorted, -1)
    # scatter back to positional order: cand[order[i]] = cand_val[i]
    cand = jnp.full((B, N), -1, dtype=jnp.int32)
    bidx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, N))
    cand = cand.at[bidx, order].set(cand_val)

    offset = pos - cand
    v_cand = jnp.take_along_axis(v, jnp.clip(cand, 0, N - 1), axis=1)
    valid = ((cand >= 0) & (offset <= max_offset)
             & (v_cand == v) & in_range
             & (pos <= lengths[:, None] - tail_guard - 1))

    # match-length extension: fixed widening passes of 16 bytes
    limit = jnp.where(valid, jnp.maximum(lengths[:, None] - 5 - pos, 0), 0)
    mlen = jnp.where(valid, jnp.int32(min_match), 0)
    W = 16
    offs = jnp.arange(W, dtype=jnp.int32)

    def ext_pass(_, carry):
        mlen, alive = carry
        a = pos + mlen
        c = jnp.clip(cand, 0, N - 1) + mlen
        ai = jnp.clip(a[..., None] + offs, 0, N - 1)      # (B, N, W)
        ci = jnp.clip(c[..., None] + offs, 0, N - 1)
        ea = jnp.take_along_axis(blocks, ai.reshape(B, -1),
                                 axis=1).reshape(B, N, W)
        ec = jnp.take_along_axis(blocks, ci.reshape(B, -1),
                                 axis=1).reshape(B, N, W)
        span = jnp.clip(limit - mlen, 0, W)
        eq = (ea == ec) & (offs[None, None, :] < span[..., None])
        run = jnp.sum(jnp.cumprod(eq, axis=-1), axis=-1).astype(jnp.int32)
        mlen = mlen + jnp.where(alive, run, 0)
        alive = alive & (run == W) & (mlen < limit)
        return mlen, alive

    mlen, _ = jax.lax.fori_loop(0, (ML_CAP - 4) // W, ext_pass,
                                (mlen, valid & (limit > 0)))
    valid = valid & (mlen >= min_match)

    # greedy parse: next[p] = p + mlen if match else p + 1; reachability
    # from 0 via pointer doubling
    nxt = jnp.where(valid, pos + mlen, pos + 1)
    nxt = jnp.minimum(nxt, N - 1)
    reach = jnp.zeros((B, N), dtype=bool).at[:, 0].set(True)
    # keep self-loop at the sentinel position N-1 harmless
    jump = nxt

    def dbl(_, carry):
        reach, jump = carry
        # scatter: every reached position marks its jump target
        tgt = jnp.where(reach, jump, 0)
        reach = reach.at[bidx, tgt].max(reach)
        jump = jnp.take_along_axis(jump, jump, axis=1)
        return reach, jump

    n_steps = max(1, int(np.ceil(np.log2(N))))
    reach, _ = jax.lax.fori_loop(0, n_steps, dbl, (reach, jump))

    selected = reach & valid
    return selected, mlen, offset.astype(jnp.int32)
