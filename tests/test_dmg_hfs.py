"""DMG and HFS+ image tests (DmgHandler.cpp / HfsHandler.cpp).

Round-trip through our minimal writers, corrupt probes, CLI drive.
"""

import struct

import pytest

from tpu7z.containers import dmg, hfs
from tpu7z.utils.errors import CorruptError


def test_dmg_roundtrip(corpus):
    parts = {"Apple_HFS": corpus["text"][:200000],
             "rand": corpus["random"][:90000]}
    img = dmg.write_dmg(parts)
    assert dmg.is_dmg(img)
    got = dmg.read_dmg(img)
    for k, want in parts.items():
        pad = (-len(want)) % 512
        assert got[k] == want + b"\0" * pad


def test_dmg_zlib_chunk_size_enforced():
    img = bytearray(dmg.write_dmg({"p": b"zlib me " * 4000}))
    # flip a byte inside the data fork (before the plist)
    img[10] ^= 0xFF
    with pytest.raises(CorruptError):
        dmg.read_dmg(bytes(img))


def test_dmg_not_dmg():
    with pytest.raises(CorruptError):
        dmg.read_dmg(b"\0" * 1024)


def test_hfs_roundtrip(corpus):
    files = {"readme.txt": b"hfs plus content " * 500,
             "empty.bin": b"",
             "rand.dat": corpus["random"][:30000]}
    img = hfs.write_hfs(files)
    assert hfs.is_hfs(img)
    assert hfs.read_hfs(img) == files


def test_hfs_extent_bounds():
    img = bytearray(hfs.write_hfs({"a.bin": b"x" * 9000}))
    # catalog fork extent pointing outside the image
    struct.pack_into(">I", img, 1024 + 272 + 16, 0xFFFFF)
    with pytest.raises(CorruptError):
        hfs.read_hfs(bytes(img))


def test_dmg_hfs_cli(tmp_path):
    from tpu7z.cli.main import main as cli
    inner = hfs.write_hfs({"doc.txt": b"nested content" * 100})
    arc = tmp_path / "disk.dmg"
    arc.write_bytes(dmg.write_dmg({"hfs_part": inner}))
    out = tmp_path / "o"
    assert cli(["x", str(arc), f"-o{out}"]) == 0
    nested = (out / "hfs_part").read_bytes()
    got = hfs.read_hfs(nested)
    assert got["doc.txt"] == b"nested content" * 100
