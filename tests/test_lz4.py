"""LZ4 block + frame codec tests, incl. interop with the reference binary."""

import os
import subprocess

import numpy as np
import pytest

from tpu7z.models import lz4
from tests.conftest import REF_7ZZ, requires_ref


def test_block_roundtrip(corpus):
    for name, data in corpus.items():
        comp = lz4.compress_block(data)
        out = lz4.decompress_block(comp, dst_size=len(data))
        assert out == data, f"round-trip failed for {name}"


def test_block_ratio_sane(corpus):
    comp = lz4.compress_block(corpus["repeat"])
    assert len(comp) < len(corpus["repeat"]) // 10
    comp = lz4.compress_block(corpus["text"])
    assert len(comp) < len(corpus["text"]) * 0.7


def test_frame_roundtrip(corpus):
    for name, data in corpus.items():
        for bs in (1 << 16, 1 << 20):
            fr = lz4.compress_frame(data, block_size=bs)
            out, used = lz4.decompress_frame(fr)
            assert used == len(fr)
            assert out == data, f"frame round-trip failed for {name} bs={bs}"


def test_frame_detects_corruption(corpus):
    fr = bytearray(lz4.compress_frame(corpus["text"]))
    fr[len(fr) // 2] ^= 0xFF
    from tpu7z.utils.errors import CorruptError
    with pytest.raises(CorruptError):
        lz4.decompress_frame(bytes(fr))


@requires_ref
def test_reference_decodes_our_frames(tmp_path, corpus):
    """Gate from SURVEY.md section 7 step 2: `7z e -tlz4` decodes our output."""
    for name in ("text", "repeat", "random", "struct", "sparse"):
        data = corpus[name]
        fr = lz4.compress_frame(data)
        p = tmp_path / f"{name}.lz4"
        p.write_bytes(fr)
        r = subprocess.run(
            [REF_7ZZ, "e", "-tlz4", "-so", str(p)],
            capture_output=True, check=True)
        assert r.stdout == data, f"reference failed to decode {name}"


@requires_ref
def test_we_decode_reference_frames(tmp_path, corpus):
    for name in ("text", "repeat", "random", "struct"):
        data = corpus[name]
        src = tmp_path / name
        src.write_bytes(data)
        arc = tmp_path / f"{name}.out.lz4"
        subprocess.run(
            [REF_7ZZ, "a", "-tlz4", str(arc), str(src)],
            capture_output=True, check=True)
        decoded = lz4.frame.decompress(arc.read_bytes())
        assert decoded == data, f"failed to decode reference frame {name}"


def test_linked_block_roundtrip(corpus):
    from tpu7z.models.lz4 import frame
    data = (corpus["text"] + corpus["struct"] + corpus["repeat"])[: 1 << 20]
    linked = frame.compress_frame(data, block_size=65536,
                                  block_independence=False)
    indep = frame.compress_frame(data, block_size=65536,
                                 block_independence=True)
    assert frame.decompress(linked) == data
    # linked mode must help (matches reach into the previous window)
    assert len(linked) <= len(indep)


def test_linked_block_edge_cases():
    from tpu7z.models.lz4 import frame
    assert frame.decompress(
        frame.compress_frame(b"", block_independence=False)) == b""
    rep = b"abcdef" * 10000
    f = frame.compress_frame(rep, block_size=4096,
                             block_independence=False)
    assert frame.decompress(f) == rep
