"""Mesh-sharded compression (zstdmt/MtCoder analog).

Independent blocks are sharded across the mesh "data" axis; the device
match kernel runs per shard with no cross-device communication (block
independence is the shard boundary, exactly like the skippable-frame
container of C/zstdmt); a psum reduces size/error statistics (CMtProgress
analog); compressed frames are gathered to host IN ORDER, replicating
MtCoder's ReadyBlocks/writeIndex ring (C/MtCoder.c:300-326) as a
deterministic indexed gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import match_jax
from .mesh import DATA_AXIS, make_mesh


def sharded_find_matches(blocks, lengths, mesh: Mesh | None = None,
                         hashlog: int = 16):
    """Run the batched match kernel with blocks sharded over the mesh.

    blocks: (B, N) uint8 with B divisible by mesh data-axis size.
    Returns host numpy (selected, mlen, moff) plus per-shard stats.
    """
    if mesh is None:
        mesh = make_mesh()
    spec = NamedSharding(mesh, P(DATA_AXIS, None))
    rspec = NamedSharding(mesh, P(DATA_AXIS))
    blocks = jax.device_put(jnp.asarray(blocks), spec)
    lengths = jax.device_put(jnp.asarray(lengths), rspec)

    @jax.jit
    def step(blocks, lengths):
        sel, mlen, moff = match_jax.find_matches(blocks, lengths,
                                                 hashlog=hashlog)
        # progress/size statistic, reduced across shards like
        # MtProgress_SetError/size accounting
        covered = jnp.sum(jnp.where(sel, mlen, 0))
        return sel, mlen, moff, covered

    sel, mlen, moff, covered = step(blocks, lengths)
    return (np.asarray(sel), np.asarray(mlen), np.asarray(moff),
            int(covered))


def shard_compress_lz4(data: bytes, mesh: Mesh | None = None,
                       block_size: int = 1 << 16) -> bytes:
    """Frame-parallel LZ4 compression over the mesh, emitting the zstdmt
    skippable-frame container (one .lz4 frame per shard-group, each
    preceded by a size-carrying skippable frame; C/zstdmt/README.md:9-17)
    so decode can re-shard without scanning."""
    from ..containers import skippable
    from ..models.lz4 import jax_backend, block as blockmod

    if mesh is None:
        mesh = make_mesh()
    ndev = mesh.devices.size

    blocks, lengths = jax_backend.pad_blocks(data, block_size)
    nb = blocks.shape[0]
    # pad block count to a multiple of the mesh size
    if nb % ndev:
        pad = ndev - nb % ndev
        blocks = np.concatenate(
            [blocks, np.zeros((pad, block_size), np.uint8)])
        lengths = np.concatenate([lengths, np.zeros(pad, np.int32)])
    sel, mlen, moff, _ = sharded_find_matches(blocks, lengths, mesh)

    frames = []
    for b in range(nb):
        n = int(lengths[b])
        s = blocks[b, :n]
        mp = np.nonzero(sel[b, :n])[0].astype(np.int64)
        ml = mlen[b, mp].astype(np.int64)
        mo = moff[b, mp].astype(np.int64)
        mp, ml, mo = blockmod.merge_adjacent_matches(mp, ml, mo)
        body = blockmod._emit_sequences(s, mp, ml, mo)
        frames.append(_wrap_single_block_frame(s, body, block_size))
    return skippable.write_container(frames)


def _wrap_single_block_frame(chunk: np.ndarray, comp: bytes,
                             block_size: int) -> bytes:
    """One independent .lz4 frame holding one block (zstdmt style: each
    worker writes a complete frame)."""
    from ..models.lz4.frame import MAGIC, _pick_bd
    from ..ops.hashing import xxh32_fast as _xxh32

    n = chunk.size
    bd_code = _pick_bd(block_size)
    out = bytearray()
    out += MAGIC.to_bytes(4, "little")
    flg = (1 << 6) | (1 << 5) | (1 << 3) | (1 << 2)
    hdr = bytearray([flg, bd_code << 4])
    hdr += n.to_bytes(8, "little")
    out += hdr
    out.append((_xxh32(bytes(hdr)) >> 8) & 0xFF)
    raw = chunk.tobytes()
    if len(comp) >= n:
        out += (n | 0x80000000).to_bytes(4, "little")
        out += raw
    else:
        out += len(comp).to_bytes(4, "little")
        out += comp
    out += (0).to_bytes(4, "little")
    out += _xxh32(raw).to_bytes(4, "little")
    return bytes(out)
