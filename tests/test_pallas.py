"""Pallas kernel tests (interpret mode on CPU; device tuning is the
round-2 pass, see docs/PERFORMANCE.md)."""

import numpy as np

from tpu7z.ops import pallas_kernels as pk


def test_histogram256_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (4, 1024), dtype=np.uint8)
    got = np.asarray(pk.histogram256(x, interpret=True))
    assert (got == pk.histogram256_np(x)).all()


def test_histogram256_skewed():
    x = np.zeros((2, 512), dtype=np.uint8)
    x[1, :] = 255
    got = np.asarray(pk.histogram256(x, interpret=True))
    assert got[0, 0] == 512 and got[1, 255] == 512
