"""XAR container — reader/writer, cross-checked with the reference
read-only handler (CPP/7zip/Archive/XarHandler.cpp)."""

import os
import subprocess

import pytest

from tpu7z.containers import xar
from tpu7z.utils.errors import CorruptError

from conftest import REF_7ZZ, requires_ref

FILES = {
    "readme.txt": b"xar content here\n" * 30,
    "blob.bin": os.urandom(4000),
    "empty": b"",
}


def test_roundtrip():
    assert xar.read_xar(xar.write_xar(FILES)) == FILES


def test_corrupt():
    b = bytearray(xar.write_xar(FILES))
    b[40] ^= 0xFF  # inside the compressed TOC
    with pytest.raises(CorruptError):
        xar.read_xar(bytes(b))


@requires_ref
def test_reference_extracts_ours(tmp_path):
    p = tmp_path / "t.xar"
    p.write_bytes(xar.write_xar(FILES))
    out = tmp_path / "x"
    subprocess.run([REF_7ZZ, "x", f"-o{out}", str(p)],
                   check=True, capture_output=True)
    for name, content in FILES.items():
        assert (out / name).read_bytes() == content, name
