"""Burrows-Wheeler transform kernels.

Behavioral reference: C/BwtSort.c (the reference's block-sort) — replaced
here by a data-parallel doubling sort (Manber-Myers over rotations):
log2(n) rounds of lexsort/rank updates, each a pure vector op. This is
the TPU-native formulation (sorts are XLA primitives); the numpy twin
below is bit-exact and used by the host codec.

Inverse BWT extracts the permutation orbit with the same
pointer-doubling trick used across tpu7z (order-preserving concat of
jump applications) instead of a serial walk.
"""

from __future__ import annotations

import numpy as np


def bwt_forward(data: bytes):
    """Returns (last_column bytes, orig_ptr). Sorts all rotations."""
    s = np.frombuffer(data, dtype=np.uint8)
    n = s.size
    if n == 0:
        return b"", 0
    if n == 1:
        return data, 0
    rank = s.astype(np.int64)
    idx = np.arange(n, dtype=np.int64)
    k = 1
    while True:
        key2 = rank[(idx + k) % n] if False else np.roll(rank, -k)
        # rotation-aware second key: rank[(i+k) mod n]
        order = np.lexsort((key2, rank))
        new_rank = np.empty(n, dtype=np.int64)
        r_ord = rank[order]
        k_ord = key2[order]
        diff = np.empty(n, dtype=bool)
        diff[0] = False
        diff[1:] = (r_ord[1:] != r_ord[:-1]) | (k_ord[1:] != k_ord[:-1])
        new_rank[order] = np.cumsum(diff)
        rank = new_rank
        if int(rank.max()) == n - 1:
            break
        k <<= 1
        if k >= n:
            # tie-break cycle-equal rotations deterministically by index
            order = np.lexsort((np.arange(n), rank))
            new_rank[order] = np.arange(n)
            rank = new_rank
            break
    # rank[i] = sorted position of rotation starting at i
    sa = np.empty(n, dtype=np.int64)
    sa[rank] = np.arange(n)
    last = s[(sa - 1) % n]
    orig_ptr = int(rank[0])
    return last.tobytes(), orig_ptr


def bwt_inverse(last: bytes, orig_ptr: int) -> bytes:
    s = np.frombuffer(last, dtype=np.uint8)
    n = s.size
    if n == 0:
        return b""
    # T[j]: position in `last` of the rotation that precedes sorted row j
    counts = np.bincount(s, minlength=256)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    # stable order of occurrences: for sorted first column, the j-th 'c'
    # in last column maps to starts[c]+j
    order_in_byte = _occurrence_index(s)
    T = starts[s] + order_in_byte  # next-pointer in decode orbit
    # The orbit of the LF-mapping enumerates the string back-to-front;
    # order-preserving doubling + one reverse yields the original.
    seq = _orbit(T.astype(np.int64), orig_ptr, n)
    return s[seq][::-1].tobytes()


def _occurrence_index(s: np.ndarray) -> np.ndarray:
    """k-th occurrence index of each byte value, vectorized."""
    n = s.size
    order = np.argsort(s, kind="stable")
    ranks = np.empty(n, dtype=np.int64)
    sorted_vals = s[order]
    first_of_run = np.empty(n, dtype=bool)
    if n:
        first_of_run[0] = True
        first_of_run[1:] = sorted_vals[1:] != sorted_vals[:-1]
    run_starts = np.cumsum(first_of_run) - 1
    # position within run
    starts_idx = np.where(first_of_run)[0]
    within = np.arange(n) - starts_idx[run_starts]
    ranks[order] = within
    return ranks


def _orbit(T: np.ndarray, start: int, n: int) -> np.ndarray:
    """[start, T[start], T[T[start]], ...] of length n, order preserved."""
    seq = np.array([start], dtype=np.int64)
    jump = T
    while seq.size < n:
        ext = jump[seq]
        seq = np.concatenate([seq, ext])
        jump = jump[jump]
    return seq[:n]
