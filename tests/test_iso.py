"""ISO 9660 container — reader/writer, cross-checked with the reference
read-only handler (CPP/7zip/Archive/Iso/)."""

import os
import subprocess

import pytest

from tpu7z.containers import iso
from tpu7z.utils.errors import CorruptError

from conftest import REF_7ZZ, requires_ref

FILES = {
    "hello.txt": b"hello iso world\n" * 50,
    "data.bin": os.urandom(5000),
    "empty": b"",
}
UPPER = {"HELLO.TXT": FILES["hello.txt"], "DATA.BIN": FILES["data.bin"],
         "EMPTY": b""}


def test_roundtrip():
    assert iso.read_iso(iso.write_iso(FILES)) == UPPER


def test_corrupt():
    img = bytearray(iso.write_iso(FILES))
    img[16 * 2048 + 1] ^= 0xFF
    with pytest.raises(CorruptError):
        iso.read_iso(bytes(img))


@requires_ref
def test_reference_extracts_ours(tmp_path):
    img = tmp_path / "t.iso"
    img.write_bytes(iso.write_iso(FILES))
    out = tmp_path / "x"
    subprocess.run([REF_7ZZ, "x", f"-o{out}", str(img)],
                   check=True, capture_output=True)
    for name, content in UPPER.items():
        assert (out / name).read_bytes() == content, name
