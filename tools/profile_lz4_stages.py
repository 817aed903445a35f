#!/usr/bin/env python3
"""Per-stage timing of the fused LZ4 device pipeline on the real chip.

Runs each pallas_call stage separately (same shapes/dataflow as
ops/lz4_pallas.encode_blocks), forcing a device->host sync after each,
and prints compile + warm times per stage. Usage:

    python tools/profile_lz4_stages.py [W] [B]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.makedirs("/tmp/jaxcache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
import jax.numpy as jnp
from jax.experimental import pallas as pl

from tpu7z.ops import lz4_pallas as LP
from tpu7z.ops import lz4_plane as P

W = int(sys.argv[1]) if len(sys.argv) > 1 else 16
B = int(sys.argv[2]) if len(sys.argv) > 2 else 16

CORPUS_PATH = "/tmp/tpu7z_bench_corpus.bin"


def get_corpus() -> bytes:
    if os.path.exists(CORPUS_PATH) and os.path.getsize(CORPUS_PATH) == 32 << 20:
        return open(CORPUS_PATH, "rb").read()
    from tpu7z.utils.corpus import make_corpus
    data = make_corpus(32 << 20)
    with open(CORPUS_PATH, "wb") as f:
        f.write(data)
    return data


def timed(name, fn, *args, iters=3):
    t0 = time.time()
    out = fn(*args)
    flat = jax.tree_util.tree_leaves(out)
    np.asarray(flat[0].ravel()[:8])
    t_compile = time.time() - t0
    best = 1e9
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        flat = jax.tree_util.tree_leaves(out)
        for f in flat:
            np.asarray(f.ravel()[:8])
        best = min(best, time.time() - t0)
    print(json.dumps({"stage": name, "compile_s": round(t_compile, 1),
                      "warm_s": round(best, 4),
                      "MBps": round(B * P.BLOCK / best / 1e6, 1)}),
          flush=True)
    return out


def main():
    data = get_corpus()[: B * P.BLOCK]
    blocks = jnp.asarray(
        np.frombuffer(data, dtype=np.uint8).reshape(B, P.BLOCK))
    ns = jnp.full((B,), P.BLOCK, jnp.int32)

    blocks3 = blocks.reshape(B, P.NROWS, P.ROW).astype(jnp.int8)
    meta = jnp.stack([ns & 0xFF, (ns >> 8) & 0xFF, (ns >> 16) & 0xFF],
                     axis=1).astype(jnp.int8)
    meta = jnp.pad(meta, ((0, 0), (0, P.ROW - 3)))
    blocks3 = jnp.concatenate([blocks3, meta[:, None, :]], axis=1)
    blocks3 = jax.device_put(blocks3)

    # tier-B candidates (XLA lax.sort)
    @jax.jit
    def tierb(blocks, ns):
        bu = blocks.reshape(B, P.BLOCK).astype(jnp.int32) & 0xFF
        w = bu
        for k in (1, 2, 3):
            sh = jnp.concatenate(
                [bu[:, k:], jnp.zeros((B, k), jnp.int32)], axis=1)
            w = w | (sh << (8 * k))
        return P.tier_b_candidates(w, ns).reshape(B, P.NROWS, P.ROW)

    bshape = (B, P.NROWS + 1, P.ROW)
    so8shape = (B, P.NROWS, P.ROW)
    mmshape = (B, 2 * P.NROWS, P.ROW)
    stshape = (B, P.NROWS, P.ROW)
    gbshape = (B, LP._NB * P.NROWS, P.ROW)
    gcshape = (B, LP._NC * P.NROWS, P.ROW)
    clshape = (B, 2 * P.P5_MID_ROWS, P.ROW)
    cshape = (B, P.CORE_ROWS, P.ROW)
    oshape = (B, P.OUT_ROWS + 1, P.ROW)

    def call(kern, inshapes, outshapes):
        """Build the jitted stage ONCE (per-call rebuilds retrace)."""
        multi = isinstance(outshapes, list)
        f = pl.pallas_call(
            kern, grid=(B,),
            in_specs=[LP._vspec(s) for s in inshapes],
            out_specs=([LP._vspec(s) for s in outshapes] if multi
                       else LP._vspec(outshapes)),
            out_shape=([jax.ShapeDtypeStruct(s, jnp.int32)
                        for s in outshapes] if multi
                       else jax.ShapeDtypeStruct(
                           outshapes,
                           jnp.int8 if outshapes is oshape else jnp.int32)),
            compiler_params=LP._COMPILER,
        )
        return jax.jit(f)

    f_a1 = call(functools.partial(LP._kernel_a1, W=W),
                [bshape, so8shape], mmshape)
    f_a2 = call(LP._kernel_a2, [mmshape], stshape)
    f_a3 = call(LP._kernel_a3, [bshape, mmshape, stshape],
                [gbshape, gcshape])
    f_b1 = call(LP._kernel_b1, [bshape, gbshape], clshape)
    f_b2 = call(LP._kernel_b2, [clshape], cshape)
    f_c = call(LP._kernel_c, [gcshape, cshape], oshape)

    so8 = timed("a0_tierB_sort", tierb, blocks, ns)
    mm = timed("a1_match", f_a1, blocks3, so8)
    st = timed("a2_parse", f_a2, mm)
    geob, geoc = timed("a3_geometry", f_a3, blocks3, mm, st)
    cl = timed("b1_pyr_lo", f_b1, blocks3, geob)
    core = timed("b2_pyr_hi", f_b2, cl)
    outm = timed("c_expand", f_c, geoc, core)

    # full fused pipeline for the total
    out, used = LP.encode_blocks(blocks, ns, W=W)
    np.asarray(used)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out, used = LP.encode_blocks(blocks, ns, W=W)
        np.asarray(used)
        best = min(best, time.time() - t0)
    usedh = np.asarray(used)
    outh = np.asarray(out)
    comp = int(sum(min(int(u), P.BLOCK + 4) for u in usedh))
    print(json.dumps({"stage": "TOTAL", "warm_s": round(best, 4),
                      "MBps": round(B * P.BLOCK / best / 1e6, 1),
                      "ratio": round(B * P.BLOCK / comp, 3),
                      "W": W, "B": B}), flush=True)
    # verify one block round-trips
    from tpu7z.models.lz4 import block as blockmod
    b0 = outh[0, : usedh[0]].astype(np.uint8).tobytes()
    assert blockmod.decompress_block(b0, dst_size=P.BLOCK) == data[:P.BLOCK]
    print("round-trip OK", flush=True)


if __name__ == "__main__":
    main()
