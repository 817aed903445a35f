"""LZMA1/LZMA2/.xz tests against the stdlib (liblzma) implementation."""

import lzma

import numpy as np
import pytest

from tpu7z.containers import xz
from tpu7z.models.lzma import decoder, encoder, lzma2

RAW1 = [{"id": lzma.FILTER_LZMA1, "lc": 3, "lp": 0, "pb": 2,
         "dict_size": 1 << 24}]
RAW2 = [{"id": lzma.FILTER_LZMA2, "dict_size": 1 << 24}]


def small(corpus):
    """LZMA python engine is the bit-exact reference, not the fast path;
    keep test payloads moderate."""
    return {k: v[:60000] for k, v in corpus.items() if len(v) > 0}


def test_lzma1_decode_stdlib_streams(corpus):
    for name, data in small(corpus).items():
        for preset in (1, 6):
            c = lzma.compress(data, format=lzma.FORMAT_ALONE, preset=preset)
            assert decoder.decompress_alone(c) == data, f"{name} p{preset}"


def test_lzma1_encode_externally_decodable(corpus):
    for name, data in small(corpus).items():
        st, _props = encoder.compress_raw(data, end_marker=True)
        assert lzma.decompress(st, format=lzma.FORMAT_RAW,
                               filters=RAW1) == data, name


def test_lzma1_raw_roundtrip(corpus):
    data = corpus["text"][:60000]
    st, props = encoder.compress_raw(data)
    assert decoder.decompress_raw(st, props, len(data)) == data


def test_lzma2_decode_stdlib_streams(corpus):
    for name, data in small(corpus).items():
        c = lzma.compress(data, format=lzma.FORMAT_RAW, filters=[
            {"id": lzma.FILTER_LZMA2, "preset": 4}])
        assert lzma2.decompress(c, len(data)) == data, name


def test_lzma2_encode_externally_decodable(corpus):
    for name, data in small(corpus).items():
        ours = lzma2.compress(data)
        assert lzma.decompress(ours, format=lzma.FORMAT_RAW,
                               filters=RAW2) == data, name


def test_lzma2_sharded_externally_decodable(corpus):
    data = corpus["text"]
    sh = lzma2.compress(data, shard_size=30000)
    assert lzma.decompress(sh, format=lzma.FORMAT_RAW, filters=RAW2) == data


def test_xz_decode_stdlib(corpus):
    for name, data in small(corpus).items():
        for check in (lzma.CHECK_CRC32, lzma.CHECK_CRC64):
            c = lzma.compress(data, format=lzma.FORMAT_XZ, preset=2,
                              check=check)
            assert xz.decompress(c) == data, name


def test_xz_encode_externally_decodable(corpus):
    for name, data in small(corpus).items():
        ours = xz.compress(data)
        assert lzma.decompress(ours, format=lzma.FORMAT_XZ) == data, name


def test_xz_multiblock(corpus):
    data = corpus["text"]
    mb = xz.compress(data, block_size=40000)
    assert lzma.decompress(mb, format=lzma.FORMAT_XZ) == data
    assert xz.decompress(mb) == data


def test_xz_empty():
    assert lzma.decompress(xz.compress(b""), format=lzma.FORMAT_XZ) == b""
    assert xz.decompress(xz.compress(b"")) == b""


def test_xz_corruption_detected(corpus):
    from tpu7z.utils.errors import CorruptError
    c = bytearray(xz.compress(corpus["text"][:30000]))
    c[40] ^= 0x7F
    with pytest.raises(CorruptError):
        xz.decompress(bytes(c))


def test_native_optimal_encoder_ratio_and_interop():
    """The native optimal-parse encoder (lzma_enc.cpp GetOptimum analog)
    must beat the Python fast parse clearly and round-trip through both
    decoders; stdlib lzma cross-checks the raw stream."""
    import lzma as stdlzma
    from tpu7z import native
    from tpu7z.models.lzma import lzma2 as l2, encoder as enc
    data = (b"the quick brown fox jumps over the lazy dog " * 400
            + bytes(range(256)) * 40)
    nat = native.lzma2_encode(data, level=9)
    if nat is None:
        import pytest
        pytest.skip("native library not built")
    assert l2.decompress(nat, len(data)) == data
    # optimal parse must not lose to the Python fast parse (on this
    # tiny highly-repetitive input both are near the floor; the real
    # ratio margin is asserted on mixed data below)
    py = l2.compress_chunks(data) + b"\x00"
    assert len(nat) <= len(py), (len(nat), len(py))
    from tpu7z.utils.corpus import make_corpus
    # a mid-corpus slice: normal-ratio mixed content (the head of the
    # corpus is a near-constant region where both parsers hit the floor)
    mixed = make_corpus(4 << 20)[1 << 20:(1 << 20) + (1 << 19)]
    nat2 = native.lzma2_encode(mixed, level=9)
    py2 = l2.compress_chunks(mixed) + b"\x00"
    assert l2.decompress(nat2, len(mixed)) == mixed
    assert len(nat2) <= int(len(py2) * 0.95), (len(nat2), len(py2))
    # raw/alone path through stdlib
    al = enc.compress_alone(data)
    assert stdlzma.decompress(al, format=stdlzma.FORMAT_ALONE) == data
