#!/usr/bin/env python3
"""Profile the native zstd decoder on the 32 MiB bench corpus.

Encodes the corpus at x3 and x19 with the native encoder (cached in
/tmp), then times tz_zstd_decode best-of-N.  Reference bar (VERDICT r3,
same machine class): `7zz t` 640.7 MB/s (x3), 531.0 MB/s (x19).
"""
import ctypes
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu7z import native  # noqa: E402
from tpu7z.models.zstd import frame as zframe  # noqa: E402

CORPUS = "/tmp/tpu7z_bench_corpus.bin"


def main():
    data = open(CORPUS, "rb").read()
    n = len(data)
    lib = native._load()
    assert lib is not None

    for lvl in (3, 19):
        cache = f"/tmp/tpu7z_prof_x{lvl}.zst"
        if os.path.exists(cache):
            comp = open(cache, "rb").read()
        else:
            t0 = time.time()
            comp = zframe.compress(data, level=lvl)
            print(f"x{lvl}: encoded {n} -> {len(comp)} in "
                  f"{time.time()-t0:.1f}s")
            open(cache, "wb").write(comp)

        cap = n + 64
        dst = ctypes.create_string_buffer(cap)
        best = 1e9
        iters = 7 if lvl == 3 else 7
        for _ in range(iters):
            t0 = time.time()
            r = lib.tz_zstd_decode(comp, len(comp), dst, cap, 1)
            dt = time.time() - t0
            assert r == n, (r, n)
            best = min(best, dt)
        assert dst.raw[:n] == data
        print(f"x{lvl}: decode {n/best/1e6:.1f} MB/s "
              f"(csize {len(comp)}, ratio {n/len(comp):.3f})")


if __name__ == "__main__":
    main()
