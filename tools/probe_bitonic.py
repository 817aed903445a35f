#!/usr/bin/env python3
"""Time the Pallas bitonic sort vs jax.lax.sort on the real chip.

Slope method (two batch sizes) to cancel the axon dispatch floor.
Usage: python tools/probe_bitonic.py [B1] [B2] [nops]
"""

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

from tpu7z.ops.sort_pallas import bitonic_sort

B1 = int(sys.argv[1]) if len(sys.argv) > 1 else 64
B2 = int(sys.argv[2]) if len(sys.argv) > 2 else 192
NOPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def mkdata(B):
    rng = np.random.default_rng(11)
    h = rng.integers(0, 1 << 16, (B, 65536), dtype=np.uint32)
    pos = np.tile(np.arange(65536, dtype=np.uint32), (B, 1))
    key = (h << 16) | pos
    pays = [rng.integers(0, 1 << 32, (B, 65536), dtype=np.uint32)
            for _ in range(NOPS - 1)]
    return jnp.asarray(key), [jnp.asarray(p) for p in pays]


def timed(fn, args, iters=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:8])
    best = 1e9
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:8])
        best = min(best, time.time() - t0)
    return best


@jax.jit
def lax_sort(key, *pays):
    return jax.lax.sort((key,) + pays, dimension=1, num_keys=1)


def run(B):
    key, pays = mkdata(B)
    t_lax = timed(lax_sort, (key, *pays))
    t_bit = timed(lambda k, *p: bitonic_sort(k, *p), (key, *pays))
    # verify once
    ks, *ps = bitonic_sort(key, *pays)
    ls = lax_sort(key, *pays)
    assert np.array_equal(np.asarray(ks), np.asarray(ls[0])), "key mismatch"
    for a, b in zip(ps, ls[1:]):
        assert np.array_equal(np.asarray(a), np.asarray(b)), "payload"
    return t_lax, t_bit


l1, b1 = run(B1)
l2, b2 = run(B2)
print(json.dumps({
    "nops": NOPS,
    "lax_ms_per_block": round((l2 - l1) / (B2 - B1) * 1e3, 4),
    "bitonic_ms_per_block": round((b2 - b1) / (B2 - B1) * 1e3, 4),
    f"lax_t{B1}": round(l1, 3), f"bit_t{B1}": round(b1, 3),
    f"lax_t{B2}": round(l2, 3), f"bit_t{B2}": round(b2, 3),
}))
