"""Progress and error aggregation across shards.

Behavioral reference: CMtProgress (C/MtDec.h:24-37) — a mutex-guarded
accumulator where the first error wins and cancels peers, threaded
through every coder via ICompressProgressInfo::SetRatioInfo
(CPP/7zip/ICoder.h:14-16).

The mesh analog: each shard contributes (in_bytes, out_bytes, error_flag)
and a psum-style reduction yields the global view; the first-error-wins
rule becomes a max over error codes (0 = ok). Device-side use:
`reduce_progress` is jit-safe and composes with shard_map; host-side use:
the Progress class aggregates across host-dispatched folder jobs.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def reduce_progress(in_sizes, out_sizes, error_flags):
    """Device-side reduction of per-shard progress triples."""
    return (jnp.sum(in_sizes), jnp.sum(out_sizes),
            jnp.max(error_flags))


class Progress:
    """Host-side accumulator (CMtProgress semantics): totals plus
    first-error-wins, optionally forwarding ratios to a callback."""

    def __init__(self, callback: Callable[[int, int], None] | None = None):
        self.in_total = 0
        self.out_total = 0
        self.error: BaseException | None = None
        self._cb = callback

    def add(self, in_bytes: int, out_bytes: int) -> None:
        if self.error is not None:
            return
        self.in_total += in_bytes
        self.out_total += out_bytes
        if self._cb is not None:
            self._cb(self.in_total, self.out_total)

    def set_error(self, exc: BaseException) -> None:
        if self.error is None:  # first error wins
            self.error = exc

    def check(self) -> None:
        if self.error is not None:
            raise self.error
