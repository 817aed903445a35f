#!/usr/bin/env python3
"""Marginal per-stage cost of the fused LZ4 device pipeline.

The axon tunnel adds a ~27 ms fixed cost to every dispatch, so absolute
stage times are meaningless; this times each stage at two batch sizes
and reports the SLOPE (ms per extra 64K block), which isolates on-chip
compute. Usage: python tools/profile_lz4_slopes.py [W] [B1] [B2]
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

W = int(sys.argv[1]) if len(sys.argv) > 1 else 64
B1 = int(sys.argv[2]) if len(sys.argv) > 2 else 64
B2 = int(sys.argv[3]) if len(sys.argv) > 3 else 192

CORPUS_PATH = "/tmp/tpu7z_bench_corpus.bin"


def best_time(fn, *args, iters=5):
    out = fn(*args)
    flat = jax.tree_util.tree_leaves(out)
    np.asarray(flat[0].ravel()[:8])
    best = 1e9
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        flat = jax.tree_util.tree_leaves(out)
        for f in flat:
            np.asarray(f.ravel()[:8])
        best = min(best, time.time() - t0)
    return best, out


def stages_for(B):
    data = open(CORPUS_PATH, "rb").read()[: B * P.BLOCK]
    blocks = jnp.asarray(
        np.frombuffer(data, dtype=np.uint8).reshape(B, P.BLOCK))
    ns = jnp.full((B,), P.BLOCK, jnp.int32)
    blocks3 = blocks.reshape(B, P.NROWS, P.ROW).astype(jnp.int8)
    meta = jnp.stack([ns & 0xFF, (ns >> 8) & 0xFF, (ns >> 16) & 0xFF],
                     axis=1).astype(jnp.int8)
    meta = jnp.pad(meta, ((0, 0), (0, P.ROW - 3)))
    blocks3 = jnp.concatenate([blocks3, meta[:, None, :]], axis=1)
    blocks3 = jax.device_put(blocks3)

    @jax.jit
    def tierb(blocks, ns):
        bu = blocks.reshape(B, P.BLOCK).astype(jnp.int32) & 0xFF
        w = bu
        for k in (1, 2, 3):
            sh = jnp.concatenate(
                [bu[:, k:], jnp.zeros((B, k), jnp.int32)], axis=1)
            w = w | (sh << (8 * k))
        so8 = P.tier_b_candidates(w, ns).reshape(B, P.NROWS, P.ROW)
        so4a, so4b = P.tier_b4_candidates(w, ns)
        return jnp.concatenate([so8, so4a.reshape(B, P.NROWS, P.ROW),
                                so4b.reshape(B, P.NROWS, P.ROW)], axis=1)

    @jax.jit
    def tierb8_only(blocks, ns):
        bu = blocks.reshape(B, P.BLOCK).astype(jnp.int32) & 0xFF
        w = bu
        for k in (1, 2, 3):
            sh = jnp.concatenate(
                [bu[:, k:], jnp.zeros((B, k), jnp.int32)], axis=1)
            w = w | (sh << (8 * k))
        return P.tier_b_candidates(w, ns)

    shp = dict(
        b=(B, P.NROWS + 1, P.ROW), so8=(B, 3 * P.NROWS, P.ROW),
        mm=(B, 2 * P.NROWS, P.ROW), st=(B, P.NROWS, P.ROW),
        gb=(B, LP._NB * P.NROWS, P.ROW), gc=(B, LP._NC * P.NROWS, P.ROW),
        cl=(B, 2 * P.P5_MID_ROWS, P.ROW), c=(B, P.CORE_ROWS, P.ROW),
        o=(B, P.OUT_ROWS + 1, P.ROW))

    def call(kern, ins, outs):
        multi = isinstance(outs, list)
        f = pl.pallas_call(
            kern, grid=(B,),
            in_specs=[LP._vspec(shp[s]) for s in ins],
            out_specs=([LP._vspec(shp[s]) for s in outs] if multi
                       else LP._vspec(shp[outs])),
            out_shape=([jax.ShapeDtypeStruct(shp[s], jnp.int32)
                        for s in outs] if multi
                       else jax.ShapeDtypeStruct(
                           shp[outs],
                           jnp.int8 if outs == "o" else jnp.int32)),
            compiler_params=LP._COMPILER)
        return jax.jit(f)

    fns = dict(
        a1=call(functools.partial(LP._kernel_a1, W=W), ["b", "so8"], "mm"),
        a2=call(LP._kernel_a2, ["mm"], "st"),
        a3=call(LP._kernel_a3, ["b", "mm", "st"], ["gb", "gc"]),
        b1=call(LP._kernel_b1, ["b", "gb"], "cl"),
        b2=call(LP._kernel_b2, ["cl"], "c"),
        c=call(LP._kernel_c, ["gc", "c"], "o"))
    return blocks, ns, blocks3, (tierb, tierb8_only), fns


def run(B):
    blocks, ns, blocks3, (tierb, tierb8_only), fns = stages_for(B)
    t = {}
    t["a0_sort8"], _ = best_time(tierb8_only, blocks, ns)
    t["a0_sorts_all"], so8 = best_time(tierb, blocks, ns)
    t["a1_match"], mm = best_time(fns["a1"], blocks3, so8)
    t["a2_parse"], st = best_time(fns["a2"], mm)
    t["a3_geom"], (geob, geoc) = best_time(fns["a3"], blocks3, mm, st)
    t["b1_pyr"], cl = best_time(fns["b1"], blocks3, geob)
    t["b2_pyr"], core = best_time(fns["b2"], cl)
    t["c_expand"], outm = best_time(fns["c"], geoc, core)

    def full(blocks, ns):
        return LP.encode_blocks(blocks, ns, W=W)
    t["TOTAL_fused"], _ = best_time(full, blocks, ns)
    return t


def main():
    t1 = run(B1)
    t2 = run(B2)
    rows = []
    for k in t1:
        slope_ms = (t2[k] - t1[k]) / (B2 - B1) * 1e3
        mbps = P.BLOCK / (slope_ms * 1e-3) / 1e6 if slope_ms > 0 else -1
        rows.append({"stage": k, f"t{B1}_ms": round(t1[k] * 1e3, 1),
                     f"t{B2}_ms": round(t2[k] * 1e3, 1),
                     "slope_ms_per_block": round(slope_ms, 3),
                     "marginal_MBps": round(mbps, 1)})
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
