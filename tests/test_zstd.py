"""Zstd codec tests: bit-exact decode of reference streams (gate from
SURVEY.md section 7 step 3) and externally-validated encode (step 4)."""

import io
import os
import subprocess

import numpy as np
import pytest
import zstandard

from tpu7z.models import zstd as zstd_pkg
from tpu7z.models.zstd import frame
from tests.conftest import REF_7ZZ, requires_ref


@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_decode_reference_streams(corpus, level):
    for name, data in corpus.items():
        c = zstandard.ZstdCompressor(level=level, write_checksum=True)\
            .compress(data)
        assert frame.decompress(c) == data, f"{name} lvl{level}"


def test_decode_multithreaded_frames(corpus):
    data = corpus["text"] * 20
    c = zstandard.ZstdCompressor(level=3, threads=2).compress(data)
    assert frame.decompress(c) == data


def test_decode_long_mode(corpus):
    data = corpus["text"] * 10
    params = zstandard.ZstdCompressionParameters.from_level(
        19, enable_ldm=True, window_log=24)
    c = zstandard.ZstdCompressor(compression_params=params).compress(data)
    assert frame.decompress(c) == data


def test_decode_streamed_unknown_size(corpus):
    data = corpus["text"] * 5
    buf = io.BytesIO()
    cctx = zstandard.ZstdCompressor(level=5)
    with cctx.stream_writer(buf, closefd=False) as w:
        for i in range(0, len(data), 50000):
            w.write(data[i:i + 50000])
    assert frame.decompress(buf.getvalue()) == data


def test_decode_concatenated_and_skippable():
    c1 = zstandard.ZstdCompressor(level=1).compress(b"part one|")
    skip = ((0x184D2A50).to_bytes(4, "little")
            + (5).to_bytes(4, "little") + b"xxxxx")
    c2 = zstandard.ZstdCompressor(level=1).compress(b"part two")
    assert frame.decompress(c1 + skip + c2) == b"part one|part two"


def test_encode_roundtrip_self(corpus):
    for name, data in corpus.items():
        c = zstd_pkg.compress(data, level=3)
        assert frame.decompress(c) == data, name


def test_encode_externally_decodable(corpus):
    """Gate: the reference implementation decodes our frames."""
    dctx = zstandard.ZstdDecompressor()
    for name, data in corpus.items():
        c = zstd_pkg.compress(data, level=3)
        out = dctx.decompress(c, max_output_size=max(len(data), 1) + 16)
        assert out == data, name


def test_encode_ratio_reasonable(corpus):
    """Round-1 ratio budget: within 25% of reference level 3 on each
    sample (target for later rounds: <= reference)."""
    for name in ("text", "repeat", "sparse", "struct"):
        data = corpus[name]
        ours = len(zstd_pkg.compress(data, level=3))
        ref = len(zstandard.ZstdCompressor(level=3).compress(data))
        assert ours <= ref * 1.25 + 64, f"{name}: {ours} vs ref {ref}"


def test_corruption_detection(corpus):
    from tpu7z.utils.errors import CorruptError
    c = bytearray(zstd_pkg.compress(corpus["text"], level=3))
    c[len(c) // 2] ^= 0xA5
    with pytest.raises(CorruptError):
        frame.decompress(bytes(c))


def test_checksum_verified(corpus):
    c = bytearray(zstd_pkg.compress(corpus["text"], level=3))
    c[-1] ^= 0xFF  # flip checksum byte
    from tpu7z.utils.errors import CorruptError
    with pytest.raises(CorruptError):
        frame.decompress(bytes(c))


@requires_ref
def test_reference_binary_roundtrip(tmp_path, corpus):
    """7zz extracts .zst files produced by our encoder."""
    for name in ("text", "repeat", "struct"):
        data = corpus[name]
        p = tmp_path / f"{name}.zst"
        p.write_bytes(zstd_pkg.compress(data, level=3))
        r = subprocess.run([REF_7ZZ, "e", "-tzstd", "-so", str(p)],
                           capture_output=True, check=True)
        assert r.stdout == data, name


@requires_ref
def test_we_decode_reference_binary(tmp_path, corpus):
    for name in ("text", "repeat", "struct"):
        data = corpus[name]
        src = tmp_path / name
        src.write_bytes(data)
        arc = tmp_path / f"{name}.out.zst"
        subprocess.run([REF_7ZZ, "a", "-tzstd", str(arc), str(src)],
                       capture_output=True, check=True)
        assert frame.decompress(arc.read_bytes()) == data, name


def test_cross_block_window():
    """Matches reach back across the 128K block boundary: two copies of
    the same 150K random payload, 200K apart, must compress to well under
    one payload's size (impossible with an in-block-only window)."""
    rng = np.random.default_rng(0xB10C)
    payload = rng.integers(0, 256, 150_000, dtype=np.uint8).tobytes()
    filler = rng.integers(0, 256, 50_000, dtype=np.uint8).tobytes()
    data = payload + filler + payload
    c = zstd_pkg.compress(data, level=3)
    assert frame.decompress(c) == data
    assert len(c) < len(payload) + len(filler) + 20_000  # 2nd copy matched


def test_block_boundary_match_split():
    """A single run longer than a block splits cleanly at boundaries."""
    data = b"Q" * 200_000 + b"tail" + b"R" * 300_000
    c = zstd_pkg.compress(data, level=1)
    assert frame.decompress(c) == data


def test_match_lengths_hashed_vs_direct():
    from tpu7z.models.lz4 import block as lz4block
    rng = np.random.default_rng(3)
    s = np.concatenate([
        np.frombuffer(b"abcdef" * 3000, np.uint8),
        rng.integers(0, 256, 4000).astype(np.uint8),
        np.zeros(9000, np.uint8)])
    ph = lz4block.build_prefix_hash(s)
    n = s.size
    pos = rng.integers(8, n - 16, 3000).astype(np.int64)
    cand = np.maximum(pos - rng.integers(1, 2000, 3000), 0).astype(np.int64)
    keep = (cand < pos)
    w = np.arange(4)
    keep &= np.all(s[pos[:, None] + w] == s[cand[:, None] + w], axis=1)
    pos, cand = pos[keep], cand[keep]
    assert pos.size > 50
    limit = (n - pos).astype(np.int64)
    got = lz4block.match_lengths_hashed(ph, pos, cand, limit)
    want = lz4block._match_lengths(s, pos, cand, limit)
    assert np.array_equal(got, want)


def test_level_ordering(corpus):
    """Higher levels never compress notably worse on mixed content."""
    data = corpus["text"] + corpus["struct"] + corpus["sparse"]
    sizes = [len(zstd_pkg.compress(data, level=lv)) for lv in (1, 3, 12)]
    assert frame.decompress(zstd_pkg.compress(data, level=12)) == data
    assert sizes[2] <= sizes[0]


def test_native_encoder_levels(corpus):
    """Native C++ host-tier encoder: round-trips through both our decoder
    and the trusted zstandard library at every level class."""
    from tpu7z import native
    if not native.available():
        pytest.skip("native library unavailable")
    for name in ("text", "repeat", "random", "sparse", "struct", "empty",
                 "one", "short"):
        data = corpus[name]
        for lvl in (1, 3, 7, 12, 19, 22):
            c = native.zstd_encode(data, lvl)
            assert c is not None
            assert frame.decompress(c) == data, (name, lvl)
            assert zstandard.ZstdDecompressor().decompress(
                c, max_output_size=max(1, len(data))) == data, (name, lvl)


def test_native_encoder_beats_numpy_speed_ratio(corpus):
    """The native tier is the default host path and must not regress the
    numpy twin's ratio by more than a small margin on text."""
    from tpu7z import native
    if not native.available():
        pytest.skip("native library unavailable")
    data = corpus["text"]
    nat = len(native.zstd_encode(data, 3))
    ref = len(zstandard.ZstdCompressor(level=3).compress(data))
    assert nat <= ref * 1.10 + 64
