"""PPMd variant I (PPMd8, zip method 98) — both directions vs reference.

Mirrors the var.H test strategy (tests/test_ppmd.py): self round-trip,
then bit-level interop with the reference 7zz zip handler
(CPP/7zip/Compress/PpmdZip.cpp)."""

import struct
import subprocess

import pytest

from tpu7z.models.ppmd import ppmd8
from tpu7z.containers import zip as zipc
from tpu7z.utils.errors import CorruptError

from conftest import REF_7ZZ, requires_ref

DATA = (b"the quick brown fox jumps over the lazy dog. " * 30
        + bytes(range(256)) * 4)


def test_roundtrip():
    for data in (b"", b"x", DATA):
        c = ppmd8.compress(data)
        assert ppmd8.decompress(c, len(data)) == data


def test_roundtrip_orders():
    for order in (2, 4, 8, 16):
        c = ppmd8.compress(DATA, order=order, mem_mb=1)
        assert ppmd8.decompress(c, len(DATA)) == DATA


def test_zip_container_roundtrip():
    arc = zipc.write_zip({"f.bin": DATA}, method=zipc.M_PPMD)
    assert zipc.read_zip(arc)["f.bin"] == DATA


def test_corrupt():
    c = bytearray(ppmd8.compress(DATA))
    c[len(c) // 2] ^= 0xFF
    with pytest.raises(CorruptError):
        ppmd8.decompress(bytes(c), len(DATA))


def _zip_raw_stream(path):
    zf = open(path, "rb").read()
    assert zf[:4] == b"PK\x03\x04"
    method = struct.unpack("<H", zf[8:10])[0]
    csize = struct.unpack("<I", zf[18:22])[0]
    nlen = struct.unpack("<H", zf[26:28])[0]
    elen = struct.unpack("<H", zf[28:30])[0]
    return method, zf[30 + nlen + elen:30 + nlen + elen + csize]


@requires_ref
def test_decode_reference_stream(tmp_path):
    src = tmp_path / "in.bin"
    src.write_bytes(DATA)
    arc = tmp_path / "a.zip"
    subprocess.run([REF_7ZZ, "a", "-tzip", "-mm=PPMd", str(arc), str(src)],
                   check=True, capture_output=True)
    method, raw = _zip_raw_stream(arc)
    assert method == 98
    assert ppmd8.decompress(raw, len(DATA)) == DATA


@requires_ref
def test_reference_extracts_ours(tmp_path):
    arc = tmp_path / "ours.zip"
    arc.write_bytes(zipc.write_zip({"f.bin": DATA}, method=zipc.M_PPMD))
    r = subprocess.run([REF_7ZZ, "e", "-so", str(arc)],
                       capture_output=True, check=True)
    assert r.stdout == DATA
