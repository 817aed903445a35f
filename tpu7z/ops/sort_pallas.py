"""Bitonic sort as a pipeline of Pallas TPU kernels over (NROWS, ROW)
planes.

STATUS: interpret-verified, NOT integrated. On the axon remote Mosaic
compiler every chunk kernel (even 4 unrolled stages) hangs the
compile service (>30 min, no cache writes), so the matcher tiers keep
jax.lax.sort for now; on a toolchain where these kernels compile, the
expected win is ~1.5-2x on the sorts (57% of the device pipeline —
see docs/PERFORMANCE.md round-5 notes).

Replaces `jax.lax.sort` in the LZ4 matcher tiers (the profiled
bottleneck: tools/profile_lz4_slopes.py shows the two XLA sorts at
~57% of the device pipeline). The network is the classic bitonic
merge sort over 2^16 elements: 136 compare-exchange stages, each
realised as two static flat shifts + selects on full-lane planes —
the Mosaic-safe construct set (docs/PERFORMANCE.md). Stages are
statically unrolled and split across a few kernels to stay inside the
remote Mosaic compiler's program-size limits (the schedule constants
must be static: the target rejects dynamically-indexed SMEM refs).

Keys must be UNIQUE (the matcher keys embed the position in the low
bits, so ties are impossible and stability is moot).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lz4_plane import ROW, NROWS, shiftl_flat, shiftr_flat

BLOCK = ROW * NROWS
LOGN = 16  # log2(BLOCK)

# stage schedule: (k, d_log) for k in 1..16, d_log in k-1..0
_STAGES = [(k, j) for k in range(1, LOGN + 1)
           for j in range(k - 1, -1, -1)]
_N_CHUNKS = 34  # kernels; 4 unrolled stages each (remote Mosaic compile stays fast)

_COMPILER = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _pos_plane():
    r = jax.lax.broadcasted_iota(jnp.int32, (NROWS, ROW), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (NROWS, ROW), 1)
    return r * ROW + c


def _exchange(key, payloads, k: int, d_log: int):
    """One compare-exchange stage at static distance d = 1 << d_log
    within ascending/descending runs of size 1 << k. Integer-only bit
    math: Mosaic rejects bool-vs-bool compares (i8->i1 truncation)."""
    d = 1 << d_log
    pos = _pos_plane()
    am_low = (pos & d) == 0

    def xshift(x):
        return jnp.where(am_low, shiftl_flat(x, d), shiftr_flat(x, d))

    okey = xshift(key)
    # keep own iff it already sits on the right side of the pair: an
    # ascending pair wants the smaller key at the low index. flip = 1
    # when this element is the pair's high slot XOR the run descends.
    flip = ((pos >> k) ^ (pos >> d_log)) & 1
    lt = (key < okey).astype(jnp.int32)
    own_wins = (lt ^ flip) > 0
    nkey = jnp.where(own_wins, key, okey)
    nps = [jnp.where(own_wins, p, xshift(p)) for p in payloads]
    return nkey, nps


def _chunk_kernel(nops: int, s0: int, s1: int, *refs):
    ins = refs[:nops]
    outs = refs[nops:]
    key = ins[0][0]
    payloads = [r[0] for r in ins[1:]]
    for (k, d_log) in _STAGES[s0:s1]:
        key, payloads = _exchange(key, payloads, k, d_log)
    outs[0][0] = key
    for r, v in zip(outs[1:], payloads):
        r[0] = v


@functools.partial(jax.jit, static_argnames=("interpret",))
def bitonic_sort(key, *payloads, interpret: bool = False):
    """Sort (B, BLOCK) uint32 operands by `key` ascending. Returns
    (key_sorted, *payloads_sorted), dtypes preserved."""
    B = key.shape[0]
    dtypes = [key.dtype] + [p.dtype for p in payloads]
    # int32 planes; uint32 keys compare correctly after a sign flip
    SIGN = jnp.uint32(0x80000000)
    k32 = (key.astype(jnp.uint32) ^ SIGN).astype(jnp.int32)
    ops = [k32] + [p.view(jnp.int32) if p.dtype == jnp.uint32
                   else p.astype(jnp.int32) for p in payloads]
    nops = len(ops)
    shape = (B, NROWS, ROW)
    ops = [o.reshape(shape) for o in ops]

    def imap(b):
        return (b, 0, 0)

    spec = pl.BlockSpec((1, NROWS, ROW), imap, memory_space=pltpu.VMEM)
    per = -(-len(_STAGES) // _N_CHUNKS)
    for c in range(_N_CHUNKS):
        s0, s1 = c * per, min((c + 1) * per, len(_STAGES))
        if s0 >= s1:
            break
        ops = pl.pallas_call(
            functools.partial(_chunk_kernel, nops, s0, s1),
            grid=(B,),
            in_specs=[spec] * nops,
            out_specs=[spec] * nops,
            out_shape=[jax.ShapeDtypeStruct(shape, jnp.int32)] * nops,
            interpret=interpret,
            compiler_params=_COMPILER,
        )(*ops)
        ops = [ops] if not isinstance(ops, (list, tuple)) else list(ops)
    outs = [o.reshape(B, BLOCK) for o in ops]
    key_u = outs[0].view(jnp.uint32) ^ SIGN
    res = [key_u if dtypes[0] == jnp.uint32 else key_u.astype(dtypes[0])]
    for o, dt in zip(outs[1:], dtypes[1:]):
        res.append(o.view(jnp.uint32) if dt == jnp.uint32 else o)
    return tuple(res)
