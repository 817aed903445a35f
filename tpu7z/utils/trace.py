"""Tracing / profiling hooks — the ZSTD_trace analog.

Behavioral reference: C/zstd/zstd_trace.h:12-44 (begin/end callbacks
around every compress/decompress with parameter + size + timing
payloads, enabled at attach time with near-zero cost when off) and the
reference bench's timing infrastructure (UI/Common/Bench.cpp).

tpu7z adds a TPU dimension: `tpu_profile()` wraps a region in the JAX
profiler so device kernels show up in a TensorBoard-loadable trace.

Usage:
    from tpu7z.utils import trace
    trace.attach(my_callback)          # or TPU7Z_TRACE=1 for stderr
    with trace.span("zstd.compress", level=19, size=len(data)):
        ...
    trace.detach()
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

_callbacks: list = []
_records: list = []
_keep_records = False


def attach(callback=None, keep_records: bool = False):
    """Register a trace callback: fn(event: dict). With
    keep_records=True events also accumulate in `records()`
    (ZSTD_trace attach model: zero cost until someone attaches)."""
    global _keep_records
    if callback is not None:
        _callbacks.append(callback)
    _keep_records = _keep_records or keep_records


def detach(callback=None):
    global _keep_records
    if callback is None:
        _callbacks.clear()
        _keep_records = False
    elif callback in _callbacks:
        _callbacks.remove(callback)


def records() -> list:
    return list(_records)


def clear():
    _records.clear()


def enabled() -> bool:
    return bool(_callbacks) or _keep_records or \
        bool(os.environ.get("TPU7Z_TRACE"))


def _emit(event: dict):
    if os.environ.get("TPU7Z_TRACE"):
        print(f"[tpu7z-trace] {event}", file=sys.stderr)
    if _keep_records:
        _records.append(event)
    for cb in _callbacks:
        cb(event)


@contextlib.contextmanager
def span(name: str, **fields):
    """Time a region; emits one event with duration + throughput
    (mirrors ZSTD_TraceCtx begin/end pairing)."""
    if not enabled():
        yield
        return
    t0 = time.perf_counter()
    err = None
    try:
        yield
    except BaseException as e:
        err = repr(e)
        raise
    finally:
        dt = time.perf_counter() - t0
        ev = {"name": name, "seconds": dt, **fields}
        if err is not None:
            ev["error"] = err
        size = fields.get("size")
        if size and dt > 0:
            ev["MBps"] = size / dt / 1e6
        _emit(ev)


@contextlib.contextmanager
def tpu_profile(logdir: str):
    """JAX profiler region: captures XLA/TPU activity under `logdir`
    for TensorBoard (the TPU-native analog of the reference's CPU
    cycle counters)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named JAX profiler annotation for a device region (shows up in
    the TPU trace viewer timeline)."""
    import jax
    return jax.profiler.TraceAnnotation(name)
