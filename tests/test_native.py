"""Native C++ module tests: equality with the Python reference tier."""

import ctypes

import numpy as np
import pytest

from tpu7z import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native module not built")


def test_hashers_match_reference_tier(corpus):
    import zlib
    import xxhash
    lib = native._load()
    for data in (b"", b"x", corpus["text"][:10000], corpus["random"][:5000]):
        assert lib.tz_xxh32(data, len(data), 0) == \
            xxhash.xxh32_intdigest(data)
        assert lib.tz_xxh64(data, len(data), 0) == \
            xxhash.xxh64_intdigest(data)
        assert lib.tz_crc32(data, len(data), 0) == zlib.crc32(data)
    assert lib.tz_crc64(b"123456789", 9, 0) == 0x995DC9BBDF1939FA


def test_lz4_decode_matches(corpus):
    from tpu7z.models import lz4
    lib = native._load()
    data = corpus["text"]
    comp = lz4.compress_block(data)
    buf = ctypes.create_string_buffer(len(data))
    assert lib.tz_lz4_decode(comp, len(comp), buf, len(data)) == len(data)
    assert buf.raw == data


def test_lzma_native_vs_stdlib(corpus):
    import lzma as L
    lib = native._load()
    data = corpus["text"]
    st = L.compress(data, format=L.FORMAT_RAW, filters=[
        {"id": L.FILTER_LZMA1, "lc": 3, "lp": 0, "pb": 2,
         "dict_size": 1 << 24}])
    h = lib.tz_lzma_new(3, 0, 2)
    win = ctypes.create_string_buffer(len(data))
    r = lib.tz_lzma_decode_chunk(h, st, len(st), win, 0, len(data))
    lib.tz_lzma_free(h)
    assert r > 0
    assert win.raw == data


def test_lz4_native_encode_round_trip(corpus):
    from tpu7z.models.lz4 import block as B
    lib = native._load()
    for name in ("text", "repeat", "random"):
        data = corpus[name]
        cap = len(data) + len(data) // 255 + 64
        buf = ctypes.create_string_buffer(cap)
        r = lib.tz_lz4_encode(data, len(data), buf, cap)
        assert r > 0
        assert B.decompress_block(buf.raw[:r], dst_size=len(data)) == data
        # incompressible input must still round-trip (all-literal fallback)
        if name == "random":
            assert r <= len(data) + len(data) // 255 + 16


from tests.conftest import REF_7ZZ, requires_ref


@requires_ref
def test_lz4_native_encode_interops_with_reference(corpus, tmp_path):
    """Our native encoder's blocks must decode with the reference lz4
    path (via its .lz4 frame handler)."""
    from tpu7z.models.lz4 import frame as F
    data = corpus["text"][:262144]
    comp = F.compress_frame(data)
    import subprocess
    src = tmp_path / "a.lz4"
    src.write_bytes(comp)
    out = subprocess.run([REF_7ZZ, "e", "-so", str(src)],
                         capture_output=True, check=True)
    assert out.stdout == data
