"""LZ4 block compression with the device (JAX/TPU) match finder.

Match finding + greedy parse run on device (tpu7z.ops.match_jax); token
emission (variable-length serialization) runs on host with the vectorized
prefix-sum emitters from block.py. This split mirrors the reference's
LzFindMt pipeline (hash/search threads feeding an emission thread,
C/LzFindMt.c:448) — except the search side is a batched kernel over many
blocks at once.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...ops import match_jax
from . import block as blockmod


def pad_blocks(data: bytes, block_size: int):
    """Split into fixed-size zero-padded blocks. Returns (blocks, lengths)."""
    s = np.frombuffer(data, dtype=np.uint8)
    n = s.size
    nblocks = max(1, -(-n // block_size))
    padded = np.zeros(nblocks * block_size, dtype=np.uint8)
    padded[:n] = s
    blocks = padded.reshape(nblocks, block_size)
    lengths = np.full(nblocks, block_size, dtype=np.int32)
    if n % block_size or n == 0:
        lengths[-1] = n - (nblocks - 1) * block_size
    return blocks, lengths


def compress_blocks_device(blocks: np.ndarray, lengths: np.ndarray,
                           hashlog: int = 16):
    """Compress a batch of independent blocks. Returns list of bytes."""
    sel, mlen, moff = match_jax.find_matches(
        jnp.asarray(blocks), jnp.asarray(lengths), hashlog=hashlog)
    sel = np.asarray(sel)
    mlen = np.asarray(mlen)
    moff = np.asarray(moff)
    out = []
    for b in range(blocks.shape[0]):
        n = int(lengths[b])
        s = blocks[b, :n]
        mp = np.nonzero(sel[b, :n])[0].astype(np.int64)
        ml = mlen[b, mp].astype(np.int64)
        mo = moff[b, mp].astype(np.int64)
        mp, ml, mo = blockmod.merge_adjacent_matches(mp, ml, mo)
        out.append(blockmod._emit_sequences(s, mp, ml, mo))
    return out


def compress_frame_device(data: bytes, block_size: int = 1 << 16,
                          **frame_kw) -> bytes:
    """Full .lz4 frame with device match finding (independent blocks)."""
    from .frame import MAGIC, _BD_SIZES, _pick_bd
    from ...ops.hashing import xxh32_fast as _xxh32

    bd_code = _pick_bd(block_size)
    bsize = min(block_size, _BD_SIZES[bd_code])
    blocks, lengths = pad_blocks(data, bsize)
    comps = compress_blocks_device(blocks, lengths) if data else []

    out = bytearray()
    out += MAGIC.to_bytes(4, "little")
    flg = (1 << 6) | (1 << 5) | (1 << 3) | (1 << 2)
    hdr = bytearray([flg, bd_code << 4])
    hdr += len(data).to_bytes(8, "little")
    out += hdr
    out.append((_xxh32(bytes(hdr)) >> 8) & 0xFF)
    for b, comp in enumerate(comps):
        n = int(lengths[b])
        chunk = blocks[b, :n].tobytes()
        if len(comp) >= n:
            out += (n | 0x80000000).to_bytes(4, "little")
            out += chunk
        else:
            out += len(comp).to_bytes(4, "little")
            out += comp
    out += (0).to_bytes(4, "little")
    out += _xxh32(data).to_bytes(4, "little")
    return bytes(out)
