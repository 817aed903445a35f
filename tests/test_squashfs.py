"""SquashFS v4 container — reader/writer, cross-checked with the
reference's read-only handler (CPP/7zip/Archive/SquashfsHandler.cpp):
7zz must extract identical bytes from images our writer produces."""

import os
import subprocess

import pytest

from tpu7z.containers import squashfs
from tpu7z.utils.errors import CorruptError

from conftest import REF_7ZZ, requires_ref

FILES = {
    "a.txt": b"hello squash " * 100,
    "big.bin": os.urandom(3 * (1 << 17) + 777),   # multi-block + tail
    "empty": b"",
}


@pytest.mark.parametrize("method", [squashfs.M_ZSTD, squashfs.M_ZLIB,
                                    squashfs.M_LZ4])
def test_roundtrip(method):
    img = squashfs.write_squashfs(FILES, method=method)
    assert squashfs.read_squashfs(img) == FILES


def test_many_files_multiblock_metadata():
    many = {f"f{i:04d}": (b"x%d" % i) * 40 for i in range(400)}
    img = squashfs.write_squashfs(many)
    assert squashfs.read_squashfs(img) == many


def test_corrupt():
    img = bytearray(squashfs.write_squashfs(FILES))
    img[0] ^= 0xFF
    with pytest.raises(CorruptError):
        squashfs.read_squashfs(bytes(img))


@requires_ref
@pytest.mark.parametrize("method", [squashfs.M_ZSTD, squashfs.M_ZLIB,
                                    squashfs.M_LZ4])
def test_reference_extracts_ours(tmp_path, method):
    img = tmp_path / "t.squashfs"
    img.write_bytes(squashfs.write_squashfs(FILES, method=method))
    outdir = tmp_path / "x"
    subprocess.run([REF_7ZZ, "x", f"-o{outdir}", str(img)],
                   check=True, capture_output=True)
    for name, content in FILES.items():
        assert (outdir / name).read_bytes() == content, name
