""".Z (Unix compress) LZW — reference decodes our output
(CPP/7zip/Compress/ZDecoder.cpp; the reference is decode-only here)."""

import os
import subprocess

import pytest

from tpu7z.models import z_lzw
from tpu7z.utils.errors import CorruptError

from conftest import REF_7ZZ, requires_ref

CASES = [b"", b"a", b"TOBEORNOTTOBEORTOBEORNOT", b"ab" * 40000,
         os.urandom(70000)]


def test_roundtrip():
    for d in CASES:
        assert z_lzw.decompress(z_lzw.compress(d)) == d


def test_roundtrip_maxbits():
    d = (b"the quick brown fox " * 500)
    for mb in (9, 12, 16):
        assert z_lzw.decompress(z_lzw.compress(d, maxbits=mb)) == d


def test_corrupt():
    with pytest.raises(CorruptError):
        z_lzw.decompress(b"\x1f\x9daaaa")
    with pytest.raises(CorruptError):
        z_lzw.decompress(b"nope")


@requires_ref
def test_reference_decodes_ours(tmp_path):
    data = (b"compress me " * 2000) + os.urandom(5000)
    p = tmp_path / "t.Z"
    p.write_bytes(z_lzw.compress(data))
    r = subprocess.run([REF_7ZZ, "e", "-tZ", "-so", str(p)],
                       capture_output=True, check=True)
    assert r.stdout == data
