"""Pallas TPU kernels (round-2 growth point).

The round-2 plan (docs/PERFORMANCE.md) replaces XLA's generic sort with
a counting/radix sort whose per-pass histograms run as Pallas kernels —
this module holds the first building blocks, each with a numpy twin and
interpret-mode tests so correctness is pinned before the device tuning
pass.

histogram256: per-block byte histograms. The byte histogram is the inner
loop of both the radix match-finder pass (hash bucketing) and entropy
table construction (hist.c analog on device).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hist_kernel(x_ref, out_ref):
    """One grid step = one block row: count byte values 0..255.

    The bin loop is a VPU compare+reduce per bin; the MXU one-hot-matmul
    variant replaces this in the tuned version.
    """
    v = x_ref[:].astype(jnp.int32)

    def body(b, _):
        out_ref[0, b] = jnp.sum((v == b).astype(jnp.int32))
        return 0

    jax.lax.fori_loop(0, 256, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def histogram256(x, interpret: bool = False):
    """x: (B, N) uint8 -> (B, 256) int32 counts; N must be a multiple
    of 128 (pad with a value you subtract afterwards, or slice)."""
    B, N = x.shape
    return pl.pallas_call(
        _hist_kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 256), jnp.int32),
        interpret=interpret,
    )(x)


def histogram256_np(x: np.ndarray) -> np.ndarray:
    """numpy twin."""
    return np.stack([np.bincount(row, minlength=256)[:256]
                     for row in x]).astype(np.int32)
