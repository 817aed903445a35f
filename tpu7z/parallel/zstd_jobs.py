"""Sharded single-frame zstd encoding — the zstdmt job model.

Behavioral reference: C/zstd/zstdmt_compress.c:693-760
(ZSTDMT_compressionJob): the input is cut into fixed-size jobs; every
job is seeded with the previous window bytes as a rawContent prefix so
matches reach across the cut; repcodes reset at each job start; the
first job writes the frame header; one XXH64 over the whole input closes
the frame. The result is ONE standard zstd frame that any decoder
(including the reference) reads.

Determinism: the job partition depends only on (len(data), job_size),
never on the worker count, so output bytes are invariant across
parallelism degree — the property the reference's -mmt matrix tests
assert (tests/main.test:79-92) and our tests mirror.

Workers run the native C++ job encoder through ctypes (the call releases
the GIL, so a thread pool gives true parallelism on the host tier; on a
pod slice each job maps to one device of the mesh axis instead).
Progress/errors aggregate through parallel.progress.Progress
(CMtProgress semantics).
"""

from __future__ import annotations

import ctypes
import struct
from concurrent.futures import ThreadPoolExecutor

from .progress import Progress

KBLOCK = 128 * 1024          # zstd block size (must divide job/overlap)
DEFAULT_JOB = 2 << 20
DEFAULT_OVERLAP = 512 << 10  # zstdmt default-ish overlap (overlapLog)


def _job_layout(n: int, job_size: int, overlap: int):
    job_size = max(KBLOCK, (job_size // KBLOCK) * KBLOCK)
    overlap = (overlap // KBLOCK) * KBLOCK
    jobs = []
    njobs = max(1, (n + job_size - 1) // job_size)
    for j in range(njobs):
        s = j * job_size
        e = min(s + job_size, n)
        p0 = max(0, s - overlap)
        kind = (2 if j == 0 else 0) | (1 if j == njobs - 1 else 0)
        jobs.append((p0, s, e, kind))
    return jobs


def compress_sharded(data: bytes, level: int = 3, checksum: bool = True,
                     job_size: int = DEFAULT_JOB,
                     overlap: int = DEFAULT_OVERLAP,
                     workers: int = 4,
                     progress: Progress | None = None) -> bytes | None:
    """One zstd frame from parallel overlap-prefix jobs.

    Returns None when the native library is unavailable (callers fall
    back to the single-threaded path).
    """
    from .. import native
    lib = native._load()
    if lib is None or not hasattr(lib, "tz_zstd_encode_job"):
        return None
    data = bytes(data)
    n = len(data)
    if n == 0 or n <= job_size:
        c = native.zstd_encode(data, level=level, checksum=checksum)
        if progress is not None and c is not None:
            progress.add(n, len(c))
        return c

    jobs = _job_layout(n, job_size, overlap)
    prog = progress or Progress()

    def run(job):
        p0, s, e, kind = job
        if prog.error is not None:
            return b""  # first error wins; peers bail out
        seg = data[p0:e]
        cap = (e - s) + (e - s) // 2 + 4096
        buf = ctypes.create_string_buffer(cap)
        r = lib.tz_zstd_encode_job(seg, len(seg), s - p0, n, level,
                                   kind, 1 if checksum else 0, buf, cap)
        if r <= 0:
            prog.set_error(RuntimeError(f"zstd job failed: {r}"))
            return b""
        prog.add(e - s, r)
        return buf.raw[:r]

    if workers <= 1:
        parts = [run(j) for j in jobs]
    else:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            parts = list(pool.map(run, jobs))
    prog.check()
    out = b"".join(parts)
    if checksum:
        x = lib.tz_xxh64(data, n, 0) & 0xFFFFFFFF
        out += struct.pack("<I", x)
    return out
