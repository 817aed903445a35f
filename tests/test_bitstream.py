import numpy as np
import pytest

from tpu7z.ops.bitstream import (BackwardBitReader, BitWriterLSB,
                                 ForwardBitReader, pack_bits_lsb,
                                 reverse_pack_bits_lsb)


def test_forward_reader_roundtrip():
    w = BitWriterLSB()
    vals = [(5, 3), (0, 1), (1023, 10), (1, 1), (0xFFFF, 16), (3, 2)]
    for v, n in vals:
        w.write(v, n)
    data = w.close()
    r = ForwardBitReader(data)
    for v, n in vals:
        assert r.read(n) == v


def test_pack_bits_matches_scalar_writer():
    rng = np.random.default_rng(0)
    nbits = rng.integers(1, 24, 200)
    values = rng.integers(0, 1 << 24, 200).astype(np.uint64)
    w = BitWriterLSB()
    for v, n in zip(values, nbits):
        w.write(int(v) & ((1 << int(n)) - 1), int(n))
    w.write(1, 1)
    expect = w.close()
    got = pack_bits_lsb(values, nbits, end_marker=True)
    assert got == expect


def test_backward_reader_reads_reverse_write_order():
    # writer writes A then B; backward reader returns B then A
    w = BitWriterLSB()
    w.write(0b101, 3)
    w.write(0b11001, 5)
    data = w.close_with_end_marker()
    r = BackwardBitReader(data)
    assert r.read(5) == 0b11001
    assert r.read(3) == 0b101
    assert r.exhausted


def test_reverse_pack_decode_order():
    rng = np.random.default_rng(1)
    nbits = rng.integers(1, 20, 100)
    values = (rng.integers(0, 1 << 20, 100).astype(np.uint64)
              & ((np.uint64(1) << nbits.astype(np.uint64)) - np.uint64(1)))
    data = reverse_pack_bits_lsb(values, nbits)
    r = BackwardBitReader(data)
    for v, n in zip(values, nbits):
        assert r.read(int(n)) == int(v)
    assert r.exhausted


def test_backward_reader_overread_zeros():
    w = BitWriterLSB()
    w.write(0b1, 1)
    data = w.close_with_end_marker()
    r = BackwardBitReader(data)
    assert r.read(1) == 1
    # overread returns zero-filled lower bits
    assert r.read(4) == 0
    assert r.overread
