#!/usr/bin/env python3
"""Probe XLA TPU sort throughput for the LZ4 sorted-neighbor matcher.

Times jax.lax.sort over (B, 65536) int32 with 1..3 operands — the
candidate-generation primitive: sort by key = hash16<<16 | pos, carrying
the two 4-byte verify words.
"""

import os
import time

import numpy as np

os.makedirs("/tmp/jaxcache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
import jax.numpy as jnp

B, N = 64, 65536
rng = np.random.default_rng(0)
key = jnp.asarray(rng.integers(-2**31, 2**31, (B, N), dtype=np.int32))
w0 = jnp.asarray(rng.integers(-2**31, 2**31, (B, N), dtype=np.int32))
w1 = jnp.asarray(rng.integers(-2**31, 2**31, (B, N), dtype=np.int32))


def bench(name, fn, *args):
    t0 = time.time()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:8])
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        for f in jax.tree_util.tree_leaves(out):
            np.asarray(f.ravel()[:8])
        best = min(best, time.time() - t0)
    mbps = B * N / best / 1e6
    print(f"{name}: compile={compile_s:.1f}s warm={best*1e3:.1f}ms "
          f"= {mbps:.0f} M elem/s", flush=True)


@jax.jit
def sort1(k):
    return jax.lax.sort((k,), dimension=1, num_keys=1)


@jax.jit
def sort3(k, a, b):
    return jax.lax.sort((k, a, b), dimension=1, num_keys=1)


@jax.jit
def argsort1(k):
    return jnp.argsort(k, axis=1)


bench("sort1", sort1, key)
bench("sort3", sort3, key, w0, w1)
bench("argsort", argsort1, key)
