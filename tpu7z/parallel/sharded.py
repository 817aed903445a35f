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


def shard_compress_lz4_device(data: bytes, mesh: Mesh | None = None,
                              W: int = 0, tier_b: bool = True) -> bytes:
    """Device-tier frame-parallel LZ4: every device encodes its span of
    64 KB blocks with the fused plane pipeline, then an ordered
    all-gather assembles ONE standard .lz4 frame ON DEVICE — the MtCoder
    ReadyBlocks/writeIndex ring (C/MtCoder.c:300-326) as a deterministic
    collective instead of a mutex-guarded ring.  Output bytes are
    invariant in the mesh size (block independence is the shard
    boundary), and the frame is plain lz4 — the reference CLI decodes it.
    """
    from ..models.lz4.frame import MAGIC
    from ..ops import lz4_plane as LP
    from ..ops.hashing import xxh32_fast

    if mesh is None:
        mesh = make_mesh()
    D = int(mesh.devices.size)
    N = LP.BLOCK
    CAP = LP.OUT_CAP

    nb = max(1, -(-len(data) // N))
    # pad the block count so every device owns an equal contiguous span
    nb_pad = -(-nb // D) * D
    k = nb_pad // D
    blocks = np.zeros((nb_pad, LP.NROWS, LP.ROW), np.int32)
    ns = np.zeros((nb_pad,), np.int32)
    for b in range(nb):
        chunk = data[b * N:(b + 1) * N]
        ns[b] = len(chunk)
        flat = np.frombuffer(chunk.ljust(N, b"\0"), np.uint8)
        blocks[b] = flat.reshape(LP.NROWS, LP.ROW).astype(np.int32)
    blocks = blocks.reshape(D, k, LP.NROWS, LP.ROW)
    ns_arr = ns.reshape(D, k)

    # .lz4 frame header: v01, block-independent, 64K blocks, no checksums
    hdr = bytes([0x60, 0x40])
    frame_hdr = (MAGIC.to_bytes(4, "little") + hdr
                 + bytes([(xxh32_fast(hdr) >> 8) & 0xFF]))
    HL = len(frame_hdr)
    FRAME_CAP = HL + nb_pad * (4 + CAP) + 4

    try:
        from jax.shard_map import shard_map  # newer jax
    except ImportError:
        from jax.experimental.shard_map import shard_map

    def assemble(outs, useds, raws, nss):
        """Vectorized ordered gather: one byte-gather over all blocks
        (no per-block unroll, so compile time is block-count-free)."""
        B = nb_pad
        outs = outs.reshape(B, CAP)
        raws = raws.reshape(B, N)
        useds = useds.reshape(B)
        nss = nss.reshape(B)
        live = nss > 0
        # raw fallback per block (lz4 frame: high bit of the size word)
        store = useds >= nss
        sizes = jnp.where(store, nss, useds) * live
        szword = jnp.where(store, jnp.uint32(1 << 31), jnp.uint32(0)) \
            | sizes.astype(jnp.uint32)
        seg = jnp.where(live, sizes + 4, 0)
        offs = HL + jnp.concatenate(
            [jnp.zeros(1, seg.dtype), jnp.cumsum(seg)[:-1]])
        total = offs[-1] + seg[-1]
        j = jnp.arange(FRAME_CAP, dtype=jnp.int32)
        hdrv = jnp.asarray(np.frombuffer(frame_hdr, np.uint8)
                           .astype(jnp.int32))
        # which block does byte j fall into?
        bidx = jnp.searchsorted(offs, j, side="right") - 1
        bidx = jnp.clip(bidx, 0, B - 1)
        rel = j - offs[bidx]
        szb = ((szword[bidx] >> (8 * jnp.clip(rel, 0, 3).astype(jnp.uint32)))
               & 0xFF).astype(jnp.int32)
        # gather one byte per output position from the right source
        br = jnp.clip(rel - 4, 0, CAP - 1)
        comp_byte = outs[bidx, br]
        raw_byte = raws[bidx, jnp.clip(rel - 4, 0, N - 1)]
        byte = jnp.where(store[bidx], raw_byte, comp_byte)
        frame = jnp.where(rel < 4, szb, byte)
        frame = jnp.where(j < HL, hdrv[jnp.minimum(j, HL - 1)], frame)
        frame = jnp.where((j >= total) | (bidx >= B), 0, frame)
        # EndMark: 4 zero bytes at [total, total+4) — already zeros
        return frame, total + 4

    def per_device(blk, n_):
        def one(args):
            b, n = args
            return LP.encode_block_planes(b, n, W=W, tier_b=tier_b)
        return jax.lax.map(one, (blk, n_))

    @jax.jit
    def mesh_step(blocks, ns_in):
        def body(blk, n_):
            out, used = per_device(blk[0], n_[0])
            outs = jax.lax.all_gather(out[None], DATA_AXIS, axis=0,
                                      tiled=True)
            useds = jax.lax.all_gather(used[None], DATA_AXIS, axis=0,
                                       tiled=True)
            raws = jax.lax.all_gather(blk, DATA_AXIS, axis=0, tiled=True)
            nss = jax.lax.all_gather(n_, DATA_AXIS, axis=0, tiled=True)
            raw_bytes = raws.reshape(nb_pad, N)
            frame, total = assemble(outs, useds, raw_bytes, nss)
            return frame, jnp.asarray(total).reshape(1)

        spec_b = P(DATA_AXIS, None, None, None)
        spec_n = P(DATA_AXIS, None)
        try:
            sm = shard_map(body, mesh=mesh, in_specs=(spec_b, spec_n),
                           out_specs=(P(), P(DATA_AXIS)), check_vma=False)
        except TypeError:
            sm = shard_map(body, mesh=mesh, in_specs=(spec_b, spec_n),
                           out_specs=(P(), P(DATA_AXIS)), check_rep=False)
        return sm(blocks, ns_in)

    spec = NamedSharding(mesh, P(DATA_AXIS, None, None, None))
    nspec = NamedSharding(mesh, P(DATA_AXIS, None))
    jb = jax.device_put(jnp.asarray(blocks), spec)
    jn = jax.device_put(jnp.asarray(ns_arr), nspec)
    frame, totals = mesh_step(jb, jn)
    total = int(np.asarray(totals)[0])
    return np.asarray(frame)[:total].astype(np.uint8).tobytes()


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
