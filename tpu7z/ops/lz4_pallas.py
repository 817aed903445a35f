"""Fused LZ4 block encoder as a single Pallas TPU kernel.

One `pallas_call` with grid (B,) encodes B independent 64 KB blocks:
match finding, greedy parse, and byte emission all execute on-device in
VMEM with zero host round-trips (the round-1 jnp pipeline lost ~100x to
per-op dispatch; see docs/PERFORMANCE.md). The algorithm and all plane
math live in ops/lz4_plane.py; the bit-exact numpy specification is
ops/lz4_twin2.py, and tests assert kernel == twin byte-for-byte.

Scalar plumbing note: the target's Pallas lowering rejects dynamic
indexing of SMEM refs, so per-block scalars ride metadata rows instead:
the input plane carries each block's valid length n in an extra row,
and the output plane carries `used` back the same way (static slices
only).

Behavioral reference for the output format: C/lz4/lz4.c
LZ4_compress_generic; the design shares nothing with its byte-serial
hash walk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import lz4_plane as P

BLOCK = P.BLOCK
OUT_CAP = P.OUT_CAP


def _kernel(block_ref, out_ref, *, W):
    meta = block_ref[0, P.NROWS, :].astype(jnp.int32) & 0xFF
    n = meta[0] | (meta[1] << 8) | (meta[2] << 16)
    block = block_ref[0, : P.NROWS, :].astype(jnp.int32) & 0xFF
    out, used = P.encode_block_planes(block, n, W=W)
    out_ref[0, : P.OUT_ROWS, :] = out.astype(jnp.int8)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, P.ROW), 1)
    used_row = ((used >> (8 * jnp.minimum(lane, 3))) & 0xFF)
    used_row = jnp.where(lane < 4, used_row, 0)
    out_ref[0, P.OUT_ROWS, :] = used_row[0].astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("W", "interpret"))
def encode_blocks(blocks, ns, W: int = P.W_DEFAULT, interpret: bool = False):
    """blocks: (B, BLOCK) uint8/int8; ns: (B,) int32 valid lengths.

    Returns (out (B, OUT_CAP) int8, used (B,) int32). Block b's LZ4
    bytes are out[b, :used[b]] (reinterpreted as uint8).
    """
    B = blocks.shape[0]
    blocks3 = blocks.reshape(B, P.NROWS, P.ROW).astype(jnp.int8)
    ns = ns.astype(jnp.int32)
    meta = jnp.stack([ns & 0xFF, (ns >> 8) & 0xFF, (ns >> 16) & 0xFF],
                     axis=1).astype(jnp.int8)
    meta = jnp.pad(meta, ((0, 0), (0, P.ROW - 3)))
    blocks3 = jnp.concatenate([blocks3, meta[:, None, :]], axis=1)

    outm = pl.pallas_call(
        functools.partial(_kernel, W=W),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P.NROWS + 1, P.ROW), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P.OUT_ROWS + 1, P.ROW),
                               lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P.OUT_ROWS + 1, P.ROW), jnp.int8),
        interpret=interpret,
    )(blocks3)
    out = outm[:, : P.OUT_ROWS, :].reshape(B, OUT_CAP)
    um = outm[:, P.OUT_ROWS, :4].astype(jnp.int32) & 0xFF
    used = um[:, 0] | (um[:, 1] << 8) | (um[:, 2] << 16) | (um[:, 3] << 24)
    return out, used
