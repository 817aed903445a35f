"""Delta filter (byte-distance differencing).

Behavioral reference: C/Delta.c (Delta_Encode/Delta_Decode, distance
1..256). Encode is a vectorized subtraction; decode's prefix dependency
is a cumulative sum per residue class mod `dist` — both map directly to
VPU ops (the reference needs a serial loop only because it streams).
"""

from __future__ import annotations

import numpy as np


def delta_encode(data: bytes, dist: int = 1) -> bytes:
    if not 1 <= dist <= 256:
        raise ValueError("delta distance must be 1..256")
    s = np.frombuffer(data, dtype=np.uint8)
    out = s.copy()
    out[dist:] = s[dist:] - s[:-dist]
    return out.tobytes()


def delta_decode(data: bytes, dist: int = 1) -> bytes:
    if not 1 <= dist <= 256:
        raise ValueError("delta distance must be 1..256")
    s = np.frombuffer(data, dtype=np.uint8)
    n = s.size
    pad = (-n) % dist
    padded = np.concatenate([s, np.zeros(pad, np.uint8)])
    cols = padded.reshape(-1, dist)
    # cumulative sum down each residue class, mod 256
    dec = np.cumsum(cols.astype(np.uint64), axis=0).astype(np.uint8)
    return dec.reshape(-1)[:n].tobytes()
