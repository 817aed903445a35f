"""Deterministic mixed benchmark corpus.

Silesia-like composition (text / source-ish / binary records / sparse /
random), generated locally because the environment has no network egress.
The reference baseline in BASELINE.md is measured over the same bytes
with the reference 7zz binary, so ratios and GB/s are apples-to-apples.
"""

from __future__ import annotations

import numpy as np

_WORDS = (
    "the of and a to in is was he for it with as his on be at by i this had "
    "not are but from or have an they which one you were her all she there "
    "would their we him been has when who will more no if out so said what "
    "up its about into than them can only other new some could time these "
    "two may then do first any my now such like our over man me even most "
    "made after also did many before must through back years where much "
    "your way well down should because each just those people mr how too "
    "little state good very make world still own see men work long get "
    "here between both life being under never day same another know while "
    "last might us great old year off come since against go came right "
    "used take three").split()


def make_corpus(size: int = 32 << 20, seed: int = 0x51E51A) -> bytes:
    rng = np.random.default_rng(seed)
    parts = []
    remaining = size
    kinds = ["text", "struct", "sparse", "random", "log"]
    weights = [0.4, 0.2, 0.15, 0.1, 0.15]
    while remaining > 0:
        kind = rng.choice(kinds, p=weights)
        n = int(min(remaining, rng.integers(1 << 18, 1 << 21)))
        if kind == "text":
            idx = rng.zipf(1.3, size=n // 5) % len(_WORDS)
            chunk = " ".join(_WORDS[i] for i in idx).encode()[:n]
        elif kind == "struct":
            t = np.arange(n // 8, dtype=np.uint64)
            rec = (t * 2654435761 % 1000003).astype("<u4")
            ts = (1700000000 + t * 37).astype("<u4")
            chunk = np.stack([rec, ts], axis=1).tobytes()[:n]
        elif kind == "sparse":
            z = np.zeros(n, dtype=np.uint8)
            hits = rng.integers(0, n, n // 400)
            z[hits] = rng.integers(1, 256, hits.size)
            chunk = z.tobytes()
        elif kind == "random":
            chunk = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        else:  # log-like lines
            lines = []
            t = 1700000000
            while sum(len(x) for x in lines) < n:
                t += int(rng.integers(1, 30))
                lvl = ("INFO", "WARN", "DEBUG")[int(rng.integers(0, 3))]
                lines.append(
                    f"{t} {lvl} svc-{int(rng.integers(0, 8))} "
                    f"request id={int(rng.integers(0, 1 << 20)):07d} "
                    f"latency={int(rng.integers(1, 500))}ms status=200\n"
                    .encode())
            chunk = b"".join(lines)[:n]
        parts.append(chunk[:remaining])
        remaining -= len(chunk[:remaining])
    return b"".join(parts)
