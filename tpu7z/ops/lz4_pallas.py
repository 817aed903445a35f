"""Fused LZ4 block encoder as a pipeline of three Pallas TPU kernels.

Grid (B,) over independent 64 KB blocks; the three stages (match+parse
geometry, packed hierarchical compaction, gap expansion) chain inside
one jit with all intermediates resident in HBM — zero host round-trips
(the round-1 jnp pipeline lost ~100x to per-op dispatch; see
docs/PERFORMANCE.md). One monolithic kernel exceeds the remote Mosaic
compiler's limits, so the split is also what makes compilation
tractable; each stage ships only the geometry planes the next one
needs (2D-concatenated — 3D stacks crash the lowering).

The algorithm and all plane math live in ops/lz4_plane.py; the
bit-exact numpy specification is ops/lz4_twin2.py, and tests assert
kernel == twin byte-for-byte.

Scalar plumbing note: the target's Pallas lowering rejects dynamic
indexing of SMEM refs, so per-block scalars ride metadata rows (the
input plane carries n; stage outputs carry `used`): static slices only.

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

# geometry planes for stage B (compaction): values then 0/1 masks
_GEOB = ("token", "litrem", "e", "glen", "mlc",
         "kept", "anchor", "mstart", "ml_ext")  # + moff appended
_NB = len(_GEOB) + 1
# geometry planes for stage C (expansion): values then masks; the last
# plane carries `used` at [0, 0]
_GEOC = ("core_pos", "gap255", "gap_before", "long_run")
_NC = len(_GEOC) + 1


def _rows(x):
    return x.reshape(P.NROWS, P.ROW)


def _meta_n(block_ref):
    meta = block_ref[0, P.NROWS, :].astype(jnp.int32) & 0xFF
    return meta[0] | (meta[1] << 8) | (meta[2] << 16)


def _kernel_a1(block_ref, so_ref, mm_ref, *, W):
    n = _meta_n(block_ref)
    block = block_ref[0, : P.NROWS, :].astype(jnp.int32) & 0xFF
    v = P.phase0_words(block)
    so = (P.phase1_nearest_offset(v, n, W) if W
          else jnp.zeros_like(v))
    so8 = so_ref[0, : P.NROWS]
    so4a = so_ref[0, P.NROWS:2 * P.NROWS]
    so4b = so_ref[0, 2 * P.NROWS:]
    mlen, moff = P.phase2_lengths(so, n, so8,
                                  extra_planes=((so4a, 4), (so4b, 4)))
    mm_ref[0] = jnp.concatenate([mlen, moff], axis=0)


def _kernel_a2(mm_ref, st_ref):
    mlen = mm_ref[0, : P.NROWS]
    st_ref[0] = P._i32(P.phase3_parse(mlen))


def _kernel_a3(block_ref, mm_ref, st_ref, geob_ref, geoc_ref):
    n = _meta_n(block_ref)
    mm = mm_ref[0]
    mlen = mm[: P.NROWS]
    moff = mm[P.NROWS:]
    is_start = st_ref[0] > 0
    geo = P.phase4_geometry(mlen, moff, is_start, n)

    pb = [P._i32(geo[k]) for k in _GEOB] + [moff]
    geob_ref[0] = jnp.concatenate(pb, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (P.NROWS, P.ROW), 1)
    pos = (jax.lax.broadcasted_iota(jnp.int32, (P.NROWS, P.ROW), 0) * P.ROW
           + lane)
    used_plane = jnp.where(pos == 0, geo["used"], 0)
    pc = [P._i32(geo[k]) for k in _GEOC] + [used_plane]
    geoc_ref[0] = jnp.concatenate(pc, axis=0)


def _unpack(g, names):
    out = {}
    for i, k in enumerate(names):
        plane = g[i * P.NROWS:(i + 1) * P.NROWS]
        out[k] = plane
    return out


# pyramid split: stage 1 (build + steps 0-3 + the two narrowing passes)
# and stage 2 (steps 4-15 on the 4x-narrowed plane) — one kernel with
# everything exceeds the remote Mosaic compiler's limits


def _kernel_b1(block_ref, geob_ref, cl_ref):
    block = block_ref[0, : P.NROWS, :].astype(jnp.int32) & 0xFF
    g = geob_ref[0]
    geo = _unpack(g, _GEOB)
    for k in ("kept", "anchor", "mstart", "ml_ext"):
        geo[k] = geo[k] > 0
    moff = g[len(_GEOB) * P.NROWS:(len(_GEOB) + 1) * P.NROWS]
    content, lens = P.phase5_build(block, moff, geo)
    content, lens = P.phase5_stage1(content, lens)
    cl_ref[0] = jnp.concatenate([content, lens], axis=0)


def _kernel_b2(cl_ref, core_ref):
    cl = cl_ref[0]
    content = cl[: P.P5_MID_ROWS]
    lens = cl[P.P5_MID_ROWS:]
    core_ref[0] = P.phase5_stage2(content, lens)


def _kernel_c(geoc_ref, core_ref, out_ref):
    g = geoc_ref[0]
    geo = _unpack(g, _GEOC)
    lr = geo["long_run"]
    geo["long_run"] = lr > 0
    used = g[len(_GEOC) * P.NROWS, 0]
    geo["used"] = used
    has_gap = jnp.max(lr) > 0

    # blocks without >= LONG_LIT literal runs (the common case) skip the
    # expensive gather-matmul expansion: the core IS the output
    @pl.when(has_gap)
    def _():
        out, _u = P.phase6_expand(core_ref[0], geo)
        out_ref[0, : P.OUT_ROWS, :] = out.astype(jnp.int8)

    @pl.when(jnp.logical_not(has_gap))
    def _():
        out_ref[0, : P.CORE_ROWS, :] = core_ref[0].astype(jnp.int8)
        out_ref[0, P.CORE_ROWS: P.OUT_ROWS, :] = jnp.zeros(
            (P.OUT_ROWS - P.CORE_ROWS, P.ROW), jnp.int8)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, P.ROW), 1)
    used_row = (used >> (8 * jnp.minimum(lane, 3))) & 0xFF
    used_row = jnp.where(lane < 4, used_row, 0)
    out_ref[0, P.OUT_ROWS, :] = used_row[0].astype(jnp.int8)


# the stages keep multiple (4096,128) planes live in VMEM; the default
# budget rejects them (v5e has 128 MB physical)
_COMPILER = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _vspec(shape, dtype=jnp.int32):
    n = len(shape)

    def imap(b):
        return (b,) + (0,) * (n - 1)

    return pl.BlockSpec((1,) + shape[1:], imap, memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("W", "interpret"))
def encode_blocks(blocks, ns, W: int = 0, interpret: bool = False):
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

    # tier-B sorted-neighbor candidates at XLA level (lax.sort is not a
    # Mosaic construct); everything stays on-device inside this jit
    bu = blocks.reshape(B, P.BLOCK).astype(jnp.int32) & 0xFF
    w = bu
    for k in (1, 2, 3):
        sh = jnp.concatenate(
            [bu[:, k:], jnp.zeros((B, k), jnp.int32)], axis=1)
        w = w | (sh << (8 * k))
    so8 = P.tier_b_candidates(w, ns).reshape(B, P.NROWS, P.ROW)
    so4a, so4b = P.tier_b4_candidates(w, ns)
    so = jnp.concatenate([so8, so4a.reshape(B, P.NROWS, P.ROW),
                          so4b.reshape(B, P.NROWS, P.ROW)], axis=1)

    bshape = (B, P.NROWS + 1, P.ROW)
    soshape = (B, 3 * P.NROWS, P.ROW)
    mmshape = (B, 2 * P.NROWS, P.ROW)
    mm = pl.pallas_call(
        functools.partial(_kernel_a1, W=W),
        grid=(B,),
        in_specs=[_vspec(bshape), _vspec(soshape)],
        out_specs=_vspec(mmshape),
        out_shape=jax.ShapeDtypeStruct(mmshape, jnp.int32),
        interpret=interpret,
        compiler_params=_COMPILER,
    )(blocks3, so)

    stshape = (B, P.NROWS, P.ROW)
    st = pl.pallas_call(
        _kernel_a2,
        grid=(B,),
        in_specs=[_vspec(mmshape)],
        out_specs=_vspec(stshape),
        out_shape=jax.ShapeDtypeStruct(stshape, jnp.int32),
        interpret=interpret,
        compiler_params=_COMPILER,
    )(mm)

    gbshape = (B, _NB * P.NROWS, P.ROW)
    gcshape = (B, _NC * P.NROWS, P.ROW)
    geob, geoc = pl.pallas_call(
        _kernel_a3,
        grid=(B,),
        in_specs=[_vspec(bshape), _vspec(mmshape), _vspec(stshape)],
        out_specs=[_vspec(gbshape), _vspec(gcshape)],
        out_shape=[jax.ShapeDtypeStruct(gbshape, jnp.int32),
                   jax.ShapeDtypeStruct(gcshape, jnp.int32)],
        interpret=interpret,
        compiler_params=_COMPILER,
    )(blocks3, mm, st)

    clshape = (B, 2 * P.P5_MID_ROWS, P.ROW)
    cl = pl.pallas_call(
        _kernel_b1,
        grid=(B,),
        in_specs=[_vspec(bshape), _vspec(gbshape)],
        out_specs=_vspec(clshape),
        out_shape=jax.ShapeDtypeStruct(clshape, jnp.int32),
        interpret=interpret,
        compiler_params=_COMPILER,
    )(blocks3, geob)

    cshape = (B, P.CORE_ROWS, P.ROW)
    core = pl.pallas_call(
        _kernel_b2,
        grid=(B,),
        in_specs=[_vspec(clshape)],
        out_specs=_vspec(cshape),
        out_shape=jax.ShapeDtypeStruct(cshape, jnp.int32),
        interpret=interpret,
        compiler_params=_COMPILER,
    )(cl)

    oshape = (B, P.OUT_ROWS + 1, P.ROW)
    outm = pl.pallas_call(
        _kernel_c,
        grid=(B,),
        in_specs=[_vspec(gcshape), _vspec(cshape)],
        out_specs=_vspec(oshape),
        out_shape=jax.ShapeDtypeStruct(oshape, jnp.int8),
        interpret=interpret,
        compiler_params=_COMPILER,
    )(geoc, core)

    out = outm[:, : P.OUT_ROWS, :].reshape(B, OUT_CAP)
    um = outm[:, P.OUT_ROWS, :4].astype(jnp.int32) & 0xFF
    used = um[:, 0] | (um[:, 1] << 8) | (um[:, 2] << 16) | (um[:, 3] << 24)
    return out, used
