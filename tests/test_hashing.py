"""Hash kernels vs trusted implementations (zlib, xxhash)."""

import zlib

import pytest
import xxhash

from tpu7z.ops import hashing


CASES = [b"", b"a", b"abc", b"hello world", bytes(range(256)) * 10,
         b"x" * 1000, bytes(range(256)) * 200]


@pytest.mark.parametrize("seed", [0, 1, 0xDEADBEEF])
def test_xxh32(seed):
    for data in CASES:
        assert hashing.xxh32(data, seed) == xxhash.xxh32_intdigest(data, seed)


@pytest.mark.parametrize("seed", [0, 1, 0xDEADBEEF])
def test_xxh64(seed):
    for data in CASES:
        assert hashing.xxh64(data, seed) == xxhash.xxh64_intdigest(data, seed)


def test_crc32():
    for data in CASES:
        assert hashing.crc32(data) == zlib.crc32(data)
    # chained
    assert hashing.crc32(b"world", hashing.crc32(b"hello ")) == \
        zlib.crc32(b"world", zlib.crc32(b"hello "))


def test_crc64_xz():
    # CRC-64/XZ check value ("123456789" -> 0x995DC9BBDF1939FA)
    assert hashing.crc64(b"123456789") == 0x995DC9BBDF1939FA
