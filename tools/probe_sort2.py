#!/usr/bin/env python3
"""Map XLA TPU sort compile/run cost vs size, plus jnp bitonic variant."""

import os
import sys
import time

import numpy as np

os.makedirs("/tmp/jaxcache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
import jax.numpy as jnp
import functools


def bench(name, fn, *args):
    print(f"[{time.strftime('%H:%M:%S')}] compiling {name}", flush=True)
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
    print(f"{name}: compile={compile_s:.1f}s warm={best*1e3:.1f}ms",
          flush=True)


@functools.partial(jax.jit, static_argnames=("n",))
def sort1(k, n):
    return jax.lax.sort((k,), dimension=1, num_keys=1)


def bitonic(k):
    """Bitonic sort along axis 1 via static rolls (XLA ops)."""
    B, N = k.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    stages = []
    kk = 2
    while kk <= N:
        j = kk // 2
        while j >= 1:
            stages.append((kk, j))
            j //= 2
        kk *= 2
    x = k
    for kk, j in stages:
        lo = jnp.concatenate([x[:, j:], x[:, :j]], axis=1)      # idx+j
        hi = jnp.concatenate([x[:, -j:], x[:, :-j]], axis=1)    # idx-j
        upper = (idx & j) != 0
        partner = jnp.where(upper, hi, lo)
        up = (idx & kk) == 0
        takemax = upper == up
        mx = jnp.maximum(x, partner)
        mn = jnp.minimum(x, partner)
        x = jnp.where(takemax, mx, mn)
    return x


rng = np.random.default_rng(0)
which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "lax"):
    for N in (4096, 16384, 65536):
        key = jnp.asarray(
            rng.integers(0, 2**31, (64, N), dtype=np.int32))
        bench(f"lax.sort N={N}", lambda k: sort1(k, N), key)

if which in ("all", "bitonic"):
    for N in (65536,):
        key = jnp.asarray(
            rng.integers(0, 2**31, (64, N), dtype=np.int32))
        f = jax.jit(bitonic)
        bench(f"bitonic N={N}", f, key)
