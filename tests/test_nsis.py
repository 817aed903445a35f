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


def _mk_solid_lzma(hdr=None):
    hdr = _HDR if hdr is None else hdr
    blob = struct.pack("<I", len(hdr)) + hdr
    for b in _BLOCKS:
        blob += struct.pack("<I", len(b)) + b
    stream, props = lzenc.compress_raw(blob, end_marker=True)
    body = props + stream
    return b"\0" * 1024 + _firstheader(len(hdr), len(body)) + body


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


def _mk_entries_header():
    """Install header with block-header table, entries and a string
    table (NSIS-3 ANSI escapes) naming the two payload blocks."""
    strings = bytearray(b"\x00")               # index 0: ""
    instdir_idx = len(strings)
    strings += bytes([3, 0x80 | 21, 0x80]) + b"sub\x00"   # "$INSTDIRsub"
    name1_idx = len(strings)
    strings += b"readme.txt\x00"
    name2_idx = len(strings)
    strings += b"app.bin\x00"

    cmds = bytearray()
    def cmd(op, *params):
        p = list(params) + [0] * (6 - len(params))
        cmds.extend(struct.pack("<7I", op, *p))
    cmd(11, instdir_idx, 1)                # SetOutPath $INSTDIRsub
    cmd(20, 0, name1_idx, 0, 111, 0)       # File readme.txt @pos 0
    cmd(20, 0, name2_idx, 4 + len(_BLOCKS[0]), 222, 0)

    header = bytearray(4 + 8 * 8)
    entries_off = len(header)
    header += cmds
    strings_off = len(header)
    header += strings
    lang_off = len(header)
    header += b"\x00\x00\x00\x00"
    struct.pack_into("<II", header, 4 + 8 * 2, entries_off,
                     len(cmds) // 28)
    struct.pack_into("<II", header, 4 + 8 * 3, strings_off, 0)
    struct.pack_into("<II", header, 4 + 8 * 4, lang_off, 0)
    return bytes(header)


def test_nsis_entries_names():
    hdr = _mk_entries_header()
    arc = _mk_solid_lzma(hdr)
    files = nsis.read_nsis(arc)
    assert files["[NSIS].nsi-header"] == hdr
    assert files["$INSTDIRsub/readme.txt"] == _BLOCKS[0]
    assert files["$INSTDIRsub/app.bin"] == _BLOCKS[1]
