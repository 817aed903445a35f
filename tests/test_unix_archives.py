"""cpio / ar / rpm containers — interop with the reference handlers
(CpioHandler.cpp / ArHandler.cpp / RpmHandler.cpp) and binutils ar."""

import shutil
import struct
import subprocess
import sys
import zlib

import pytest

from tpu7z.containers import ar, cpio, rpm
from tpu7z.utils.errors import CorruptError

from conftest import REF_7ZZ, requires_ref

FILES = {
    "alpha.txt": b"alpha content " * 10,
    "beta.bin": bytes(range(256)),
    "a-very-long-file-name-over-sixteen-chars.dat": b"long name data",
}


def test_cpio_roundtrip():
    assert cpio.read_cpio(cpio.write_cpio(FILES)) == FILES


def test_ar_roundtrip():
    assert ar.read_ar(ar.write_ar(FILES)) == FILES


def test_corrupt():
    with pytest.raises(CorruptError):
        cpio.read_cpio(b"garbage!" * 20)
    with pytest.raises(CorruptError):
        ar.read_ar(b"not an archive")


def _make_rpm(files: dict, payload: bytes) -> bytes:
    def header(entries):
        idx = b""
        store = b""
        for tag, typ, data, count in entries:
            idx += struct.pack(">IIII", tag, typ, len(store), count)
            store += data
        return struct.pack(">IIII", 0x8EADE801, 0, len(entries),
                           len(store)) + idx + store

    lead = struct.pack(">IBB", 0xEDABEEDB, 3, 0) \
        + struct.pack(">HH", 0, 1) + b"t-1.0\x00".ljust(66, b"\x00") \
        + struct.pack(">HH", 1, 5) + b"\x00" * 16
    out = bytearray(lead) + header([(1000, 4, struct.pack(">I", 0), 1)])
    out += bytes((-len(out)) % 8)
    out += header([(1125, 6, b"gzip\x00", 1), (1124, 6, b"cpio\x00", 1)])
    out += payload
    return bytes(out)


def test_rpm_reader():
    inner = {"./usr/bin/x": b"data1", "./etc/c": b"k=v\n"}
    body = cpio.write_cpio(inner)
    gz = (b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\x03"
          + zlib.compress(body, 9)[2:-4]
          + struct.pack("<II", zlib.crc32(body), len(body)))
    blob = _make_rpm(inner, gz)
    assert rpm.read_rpm(blob) == {"usr/bin/x": b"data1", "etc/c": b"k=v\n"}


@requires_ref
def test_reference_extracts_our_cpio(tmp_path):
    arc = tmp_path / "t.cpio"
    arc.write_bytes(cpio.write_cpio(FILES))
    out = tmp_path / "x"
    subprocess.run([REF_7ZZ, "x", f"-o{out}", str(arc)],
                   check=True, capture_output=True)
    for name, content in FILES.items():
        assert (out / name).read_bytes() == content, name


@requires_ref
def test_reference_extracts_our_ar(tmp_path):
    arc = tmp_path / "t.a"
    arc.write_bytes(ar.write_ar(FILES))
    out = tmp_path / "x"
    subprocess.run([REF_7ZZ, "x", f"-o{out}", str(arc)],
                   check=True, capture_output=True)
    for name, content in FILES.items():
        assert (out / name).read_bytes() == content, name


@pytest.mark.skipif(shutil.which("ar") is None, reason="no binutils ar")
def test_we_read_binutils_ar(tmp_path):
    f1 = tmp_path / "m1.txt"
    f1.write_bytes(b"one\n")
    f2 = tmp_path / "m2_with_a_much_longer_name_indeed.txt"
    f2.write_bytes(b"two\n")
    arc = tmp_path / "sys.a"
    subprocess.run(["ar", "rc", str(arc), str(f1), str(f2)], check=True)
    got = ar.read_ar(arc.read_bytes())
    assert got["m1.txt"] == b"one\n"
    assert got["m2_with_a_much_longer_name_indeed.txt"] == b"two\n"


def test_lzh_roundtrip():
    from tpu7z.containers import lzh
    files = {"hello.txt": b"stored " * 40, "b.bin": bytes(range(200))}
    assert lzh.read_lzh(lzh.write_lzh(files)) == files


def test_lzh_corrupt():
    from tpu7z.containers import lzh
    files = {"a": b"xyz" * 10}
    blob = bytearray(lzh.write_lzh(files))
    blob[1] ^= 0xFF  # header checksum
    with pytest.raises(CorruptError):
        lzh.read_lzh(bytes(blob))


@requires_ref
def test_reference_extracts_our_lzh(tmp_path):
    from tpu7z.containers import lzh
    files = {"hello.txt": b"stored " * 40, "b.bin": bytes(range(200))}
    p = tmp_path / "t.lzh"
    p.write_bytes(lzh.write_lzh(files))
    out = tmp_path / "x"
    subprocess.run([REF_7ZZ, "x", f"-o{out}", str(p)],
                   check=True, capture_output=True)
    for name, content in files.items():
        assert (out / name).read_bytes() == content, name
