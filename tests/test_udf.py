"""UDF reader/writer tests (reference: CPP/7zip/Archive/Udf/UdfIn.cpp).

Round-trip through our minimal writer plus corrupt-input probes, the
same strategy as the other container suites.
"""

import pytest

from tpu7z.containers import udf
from tpu7z.utils.errors import CorruptError


def test_udf_roundtrip(corpus):
    files = {"readme.txt": b"udf payload " * 300,
             "empty.bin": b"",
             "rand.dat": corpus["random"][:5000]}
    img = udf.write_udf(files)
    assert udf.is_udf(img)
    assert udf.read_udf(img) == files


def test_udf_many_files():
    files = {f"f{i:03d}.bin": bytes([i]) * (i * 37 + 1)
             for i in range(40)}
    img = udf.write_udf(files)
    assert udf.read_udf(img) == files


def test_udf_tag_checksum_enforced():
    img = bytearray(udf.write_udf({"a.txt": b"hello"}))
    img[256 * 2048] ^= 0xFF  # anchor tag byte
    with pytest.raises(CorruptError):
        udf.read_udf(bytes(img))


def test_udf_not_udf():
    with pytest.raises(CorruptError):
        udf.read_udf(b"\0" * (40 * 2048))


def test_udf_cli(tmp_path):
    from tpu7z.cli.main import main as cli
    src = tmp_path / "doc.txt"
    src.write_bytes(b"via the cli" * 100)
    arc = tmp_path / "disk.udf"
    assert cli(["a", "-tudf", str(arc), str(src)]) == 0
    out = tmp_path / "out"
    assert cli(["x", str(arc), f"-o{out}"]) == 0
    assert (out / "doc.txt").read_bytes() == src.read_bytes()
