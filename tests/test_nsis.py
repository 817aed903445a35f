"""NSIS partial-reader tests over synthesized installers following
the NsisIn.cpp:5777 stream-shape table."""

import struct

import pytest

from tpu7z.containers import nsis
from tpu7z.models import deflate
from tpu7z.models.lzma import encoder as lzenc
from tpu7z.utils.errors import CorruptError

_HDR = b"\x01\x02installer header" * 40
_BLOCKS = [b"first file payload " * 50, b"\x00\xffsecond" * 99]


def _firstheader(header_size, body_len):
    return (struct.pack("<I", 0) + b"\xef\xbe\xad\xdeNullsoftInst"
            + struct.pack("<II", header_size, 28 + body_len))


def _mk_nonsolid_deflate():
    chdr = deflate.compress(_HDR)
    body = struct.pack("<I", len(chdr) | 0x80000000) + chdr
    for b in _BLOCKS:
        cb = deflate.compress(b)
        body += struct.pack("<I", len(cb) | 0x80000000) + cb
    return b"\0" * 512 + _firstheader(len(_HDR), len(body)) + body


def _mk_solid_lzma():
    blob = _HDR
    for b in _BLOCKS:
        blob += struct.pack("<I", len(b)) + b
    stream, props = lzenc.compress_raw(blob, end_marker=True)
    body = props + stream
    return b"\0" * 1024 + _firstheader(len(_HDR), len(body)) + body


def _check(files):
    assert files["[NSIS].nsi-header"] == _HDR
    assert files["data_0000.bin"] == _BLOCKS[0]
    assert files["data_0001.bin"] == _BLOCKS[1]


def test_nsis_nonsolid_deflate():
    arc = _mk_nonsolid_deflate()
    assert nsis.is_nsis(arc)
    _check(nsis.read_nsis(arc))


def test_nsis_solid_lzma():
    arc = _mk_solid_lzma()
    assert nsis.is_nsis(arc)
    _check(nsis.read_nsis(arc))


def test_nsis_not_nsis():
    assert not nsis.is_nsis(b"\0" * 4096)
    with pytest.raises(CorruptError):
        nsis.read_nsis(b"\0" * 4096)


def test_nsis_truncated():
    arc = _mk_nonsolid_deflate()
    with pytest.raises(CorruptError):
        nsis.read_nsis(arc[:len(arc) - 40])
