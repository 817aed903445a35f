"""LZX codec + CHM container tests.

The LZX encoder is validated two ways: self round-trip across all
block types, and — the strong check — the reference 7zz extracting an
LZX-compressed CHM we wrote (LzxDecoder.cpp is the decode oracle).
"""

import random
import struct
import subprocess

import pytest

from tpu7z.containers import chm
from tpu7z.models import lzx
from tpu7z.utils.errors import CorruptError

from tests.conftest import REF_7ZZ, requires_ref


def test_lzx_roundtrip_cases(corpus):
    rng = random.Random(7)
    cases = [
        b"",
        b"a",
        b"hello world " * 1000,
        bytes(rng.randrange(256) for _ in range(5000)),  # uncompressed
        (b"abcabcabcabd" * 3000)[:40000],                # multi-frame
        corpus["text"][:100000],
    ]
    for data in cases:
        comp, offs = lzx.encode_frames(data, 16)
        got = lzx.decode_frames(comp, offs, 16, lzx.FRAME, len(data))
        assert got == data


def test_lzx_window_bits_validated():
    with pytest.raises(CorruptError):
        lzx.State(14)


def test_lzx_corrupt_stream():
    data = b"payload " * 2000
    comp, offs = lzx.encode_frames(data, 16)
    bad = bytearray(comp)
    bad[len(bad) // 2] ^= 0xFF
    try:
        got = lzx.decode_frames(bytes(bad), offs, 16, lzx.FRAME,
                                len(data))
        assert got != data  # either error or wrong bytes, never silent
    except CorruptError:
        pass


def test_chm_roundtrip(corpus):
    files = {"index.html": b"<html>hello chm</html>" * 300,
             "data/blob.bin": bytes(range(256)) * 200,
             "rand.bin": corpus["random"][:9000]}
    arc = chm.write_chm(files)
    assert chm.is_chm(arc)
    assert chm.read_chm(arc) == files


def test_chm_directory_bounds():
    arc = bytearray(chm.write_chm({"a.txt": b"x" * 100}))
    # blow up the ITSP block count field
    _s0o, _s0l, dir_off, _dl = struct.unpack_from("<QQQQ", arc, 0x38)
    struct.pack_into("<I", arc, dir_off + 0x2C, 0xFFFFFFFF)
    with pytest.raises(CorruptError):
        chm.read_chm(bytes(arc))


def test_chm_cli(tmp_path):
    from tpu7z.cli.main import main as cli
    src = tmp_path / "page.html"
    src.write_bytes(b"<p>cli chm</p>" * 500)
    arc = tmp_path / "help.chm"
    from tpu7z.containers.chm import write_chm
    arc.write_bytes(write_chm({"page.html": src.read_bytes()}))
    out = tmp_path / "o"
    assert cli(["x", str(arc), f"-o{out}"]) == 0
    assert (out / "page.html").read_bytes() == src.read_bytes()


@requires_ref
def test_chm_reference_extracts_our_lzx(tmp_path):
    files = {"index.html": b"<html>ref reads us</html>" * 400,
             "big.bin": bytes(range(256)) * 300}  # spans 2+ frames
    arc = tmp_path / "t.chm"
    arc.write_bytes(chm.write_chm(files))
    r = subprocess.run([REF_7ZZ, "t", str(arc)], capture_output=True,
                       text=True)
    assert "Everything is Ok" in r.stdout, r.stdout
    for name, want in files.items():
        r = subprocess.run([REF_7ZZ, "e", "-so", str(arc), name],
                           capture_output=True)
        assert r.stdout == want, name
