"""RAR4/RAR5 reader tests (Rar5Handler.cpp / RarHandler.cpp).

RAR5 round-trips through our store-mode writer (which the reference
7zz verifies — see test_rar5_reference_interop); RAR4 uses a
hand-built store archive per the 1.5-4.x block layout.
"""

import struct
import zlib

import pytest

from tpu7z.containers import rar
from tpu7z.utils.errors import CorruptError, UnsupportedError

from tests.conftest import REF_7ZZ, requires_ref


def test_rar5_store_roundtrip():
    files = {"doc.txt": b"rar5 store payload " * 100,
             "z.bin": bytes(range(256))}
    arc = rar.write_rar5_store(files)
    assert rar.is_rar(arc)
    assert rar.read_rar(arc) == files


def test_rar5_header_crc_enforced():
    arc = bytearray(rar.write_rar5_store({"a": b"x" * 10}))
    arc[20] ^= 0xFF
    with pytest.raises(CorruptError):
        rar.read_rar(bytes(arc))


def test_rar5_compressed_member_garbage_raises():
    """A RAR5 member marked compressed (method 1) whose packed bytes
    are garbage must raise CorruptError from the LZ decoder (the
    method itself is supported since models/rar5.py landed)."""
    data = b"y" * 64
    nb = b"a.txt"
    body = (rar._vint_enc(0x04) + rar._vint_enc(len(data))
            + rar._vint_enc(0) + struct.pack("<I", zlib.crc32(data))
            + rar._vint_enc(1 << 7)   # method 1 (fastest), not store
            + rar._vint_enc(1) + rar._vint_enc(len(nb)) + nb)
    hdr = (rar._vint_enc(2) + rar._vint_enc(0x02)
           + rar._vint_enc(len(data)) + body)
    sized = rar._vint_enc(len(hdr)) + hdr
    arc = (rar.SIG5 + struct.pack("<I", zlib.crc32(sized)) + sized
           + data)
    with pytest.raises(CorruptError):
        rar.read_rar(arc)


def _mk_rar4(files):
    out = bytearray(rar.SIG4)

    def block(htype, flags, body, data=b""):
        hdr = struct.pack("<BHH", htype, flags, 7 + len(body)) + body
        crc = zlib.crc32(hdr) & 0xFFFF
        out.extend(struct.pack("<H", crc) + hdr + data)

    block(0x73, 0, b"\0" * 6)  # main header
    for name, data in files.items():
        nb = name.encode("latin-1")
        body = struct.pack("<IIBIIBBHI", len(data), len(data), 0,
                           zlib.crc32(data), 0, 20, 0x30, len(nb), 0)
        body += nb
        block(0x74, 0, body, data)
    block(0x7B, 0, b"")
    return bytes(out)


def test_rar4_store_read():
    files = {"old.txt": b"rar4 stored " * 50}
    arc = _mk_rar4(files)
    assert rar.is_rar(arc)
    assert rar.read_rar(arc) == files


def test_rar4_crc_enforced():
    arc = bytearray(_mk_rar4({"f": b"data"}))
    arc[10] ^= 0xFF
    with pytest.raises(CorruptError):
        rar.read_rar(bytes(arc))


@requires_ref
def test_rar5_reference_interop(tmp_path):
    import subprocess
    files = {"doc.txt": b"reference reads us " * 64}
    arc = tmp_path / "t.rar"
    arc.write_bytes(rar.write_rar5_store(files))
    r = subprocess.run([REF_7ZZ, "t", str(arc)], capture_output=True,
                      text=True)
    assert "Everything is Ok" in r.stdout
    r = subprocess.run([REF_7ZZ, "e", "-so", str(arc), "doc.txt"],
                      capture_output=True)
    assert r.stdout == files["doc.txt"]
