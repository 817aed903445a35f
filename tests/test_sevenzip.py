""".7z container tests: read archives created by the reference binary,
and have the reference test/extract archives we create (the reference's
own e2e strategy, tests/main.test:94-125 encrypt matrix included)."""

import os
import subprocess

import numpy as np
import pytest

from tpu7z.containers.sevenzip import SevenZipReader, write_archive, writer
from tests.conftest import REF_7ZZ, requires_ref


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    rng = np.random.default_rng(5)
    return {
        "a.txt": b"hello seven zip " * 500,
        "b.bin": rng.integers(0, 256, 30000, dtype=np.uint8).tobytes(),
        "sub_c.txt": b"another file with text content " * 300,
        "empty.txt": b"",
    }


def test_roundtrip_self(files):
    for m in ("lzma2", "zstd", "copy", "bzip2", "lz4", "deflate"):
        arc = write_archive(files, method=m)
        out = SevenZipReader(arc).extract_all()
        assert out == {**{n: d for n, d in files.items()}}, m


def test_roundtrip_non_solid(files):
    arc = write_archive(files, method="lzma2", solid=False)
    out = SevenZipReader(arc).extract_all()
    for n, d in files.items():
        assert out[n] == d


def test_encrypted_roundtrip(files):
    arc = write_archive(files, method="lzma2", password="pw123")
    out = SevenZipReader(arc, password="pw123").extract_all()
    for n, d in files.items():
        assert out[n] == d
    from tpu7z.utils.errors import UnsupportedError
    with pytest.raises(UnsupportedError):
        SevenZipReader(arc).extract_all()


def test_corrupt_detected(files):
    from tpu7z.utils.errors import CorruptError
    arc = bytearray(write_archive(files, method="lzma2"))
    arc[40] ^= 0xFF
    with pytest.raises(CorruptError):
        SevenZipReader(bytes(arc)).extract_all()


@requires_ref
@pytest.mark.parametrize("method", ["lzma2", "zstd", "copy", "bzip2",
                                    "lz4", "deflate", "lzma"])
def test_read_reference_archives(tmp_path, files, method):
    names = []
    for n, d in files.items():
        (tmp_path / n).write_bytes(d)
        names.append(n)
    arc = tmp_path / "t.7z"
    r = subprocess.run([REF_7ZZ, "a", str(arc), f"-m0={method}"] +
                       [str(tmp_path / n) for n in names],
                       capture_output=True)
    assert r.returncode == 0
    out = SevenZipReader(arc.read_bytes()).extract_all()
    for n, d in files.items():
        assert out[n] == d, f"{method}:{n}"


@requires_ref
@pytest.mark.parametrize("method", ["lzma2", "zstd", "bzip2", "lz4",
                                    "deflate", "copy"])
def test_reference_extracts_our_archives(tmp_path, files, method):
    arc = tmp_path / "ours.7z"
    arc.write_bytes(write_archive(files, method=method))
    r = subprocess.run([REF_7ZZ, "t", str(arc)], capture_output=True)
    assert b"Everything is Ok" in r.stdout, r.stdout[-400:]
    outdir = tmp_path / "x"
    subprocess.run([REF_7ZZ, "x", "-y", f"-o{outdir}", str(arc)],
                   capture_output=True, check=True)
    for n, d in files.items():
        assert (outdir / n).read_bytes() == d


@requires_ref
def test_reference_decrypts_our_archive(tmp_path, files):
    arc = tmp_path / "enc.7z"
    arc.write_bytes(write_archive(files, method="lzma2", password="s3cret"))
    r = subprocess.run([REF_7ZZ, "t", "-ps3cret", str(arc)],
                       capture_output=True)
    assert b"Everything is Ok" in r.stdout


@requires_ref
def test_we_decrypt_reference_archive(tmp_path, files):
    for n, d in files.items():
        (tmp_path / n).write_bytes(d)
    arc = tmp_path / "refenc.7z"
    subprocess.run([REF_7ZZ, "a", str(arc), "-ps3cret", "-m0=lzma2",
                    str(tmp_path / "a.txt"), str(tmp_path / "b.bin")],
                   capture_output=True, check=True)
    out = SevenZipReader(arc.read_bytes(), password="s3cret").extract_all()
    assert out["a.txt"] == files["a.txt"]
    assert out["b.bin"] == files["b.bin"]


@requires_ref
def test_read_reference_filter_chain(tmp_path, files):
    (tmp_path / "b.bin").write_bytes(files["b.bin"])
    arc = tmp_path / "d.7z"
    subprocess.run([REF_7ZZ, "a", str(arc), "-m0=delta:4", "-m1=lzma2",
                    str(tmp_path / "b.bin")], capture_output=True, check=True)
    out = SevenZipReader(arc.read_bytes()).extract_all()
    assert out["b.bin"] == files["b.bin"]


@requires_ref
def test_bcj2_writer_reference_extracts(tmp_path):
    rng = np.random.default_rng(31)
    buf = bytearray(rng.integers(0, 256, 50000, dtype=np.uint8).tobytes())
    for i in range(0, len(buf) - 10, 50):
        buf[i] = 0xE8
        buf[i + 4] = 0x00
    files = {"prog.bin": bytes(buf)}
    arc = tmp_path / "b2.7z"
    arc.write_bytes(write_archive(files, method="bcj2"))
    out = SevenZipReader(arc.read_bytes()).extract_all()
    assert out == files
    r = subprocess.run([REF_7ZZ, "t", str(arc)], capture_output=True)
    assert b"Everything is Ok" in r.stdout
    outdir = tmp_path / "x"
    subprocess.run([REF_7ZZ, "x", "-y", f"-o{outdir}", str(arc)],
                   capture_output=True, check=True)
    assert (outdir / "prog.bin").read_bytes() == files["prog.bin"]


@requires_ref
def test_decode_reference_bcj2_folder(tmp_path):
    """Reference -mf=BCJ2 produces the 4-coder folder graph
    (LZMA+LZMA+LZMA2 feeding BCJ2's four inputs)."""
    elf = open(REF_7ZZ, "rb").read()[:200000]
    src = tmp_path / "prog"
    src.write_bytes(elf)
    arc = tmp_path / "e.7z"
    r = subprocess.run([REF_7ZZ, "a", "-mf=BCJ2", str(arc), str(src)],
                       capture_output=True)
    assert r.returncode == 0
    rd = SevenZipReader(arc.read_bytes())
    assert any(c.method_id == 0x303011B
               for f in rd.streams.folders for c in f.coders)
    assert rd.extract_all()["prog"] == elf


def test_update_preserves_methods_and_contents(files):
    """7zUpdate repack analog: untouched folders keep their packed bytes
    (method preservation, reference bug #340 regression scenario)."""
    from tpu7z.containers.sevenzip.writer import update_archive
    arc = write_archive(files, method="zstd", solid=False)
    arc2 = update_archive(arc, add={"d.txt": b"fresh " * 100},
                          delete=["b.bin"], method="lzma2")
    rd = SevenZipReader(arc2)
    out = rd.extract_all()
    assert "b.bin" not in out
    assert out["a.txt"] == files["a.txt"]
    assert out["d.txt"] == b"fresh " * 100
    mids = [c.method_id for f in rd.streams.folders for c in f.coders]
    assert 0x4F71101 in mids  # untouched zstd folders kept
    assert 0x21 in mids       # new file folder is lzma2


@requires_ref
def test_update_reference_archive_roundtrip(tmp_path, files):
    from tpu7z.containers.sevenzip.writer import update_archive
    for n, d in files.items():
        (tmp_path / n).write_bytes(d)
    arc = tmp_path / "r.7z"
    subprocess.run([REF_7ZZ, "a", str(arc), "-m0=zstd", "-ms=off",
                    str(tmp_path / "a.txt"), str(tmp_path / "b.bin")],
                   capture_output=True, check=True)
    upd = update_archive(arc.read_bytes(), add={"n.txt": b"x" * 500},
                         delete=["b.bin"])
    (tmp_path / "u.7z").write_bytes(upd)
    r = subprocess.run([REF_7ZZ, "t", str(tmp_path / "u.7z")],
                       capture_output=True)
    assert b"Everything is Ok" in r.stdout


def test_encrypted_header_round_trip(corpus):
    """-mhe=on analog: header stored as LZMA2<-AES256 kEncodedHeader."""
    files = {"a.txt": corpus["text"][:5000], "b/c.bin": corpus["random"][:999],
             "empty": b""}
    arc = writer.write_archive(files, method="zstd", password="pw123",
                               encrypt_header=True)
    assert SevenZipReader(arc, password="pw123").extract_all() == files
    with pytest.raises(Exception):
        SevenZipReader(arc, password="nope").extract_all()
    # file names must not appear in the clear
    assert "a.txt".encode("utf-16-le") not in arc


@requires_ref
def test_encrypted_header_interop(corpus, tmp_path):
    files = {"s.txt": corpus["text"][:4000]}
    arc = writer.write_archive(files, method="lzma2", password="pw1",
                               encrypt_header=True)
    p = tmp_path / "he.7z"
    p.write_bytes(arc)
    r = subprocess.run([REF_7ZZ, "t", "-ppw1", str(p)], capture_output=True)
    assert r.returncode == 0 and b"Everything is Ok" in r.stdout
    # reverse: reference writes -mhe=on, we read
    src = tmp_path / "s.txt"
    src.write_bytes(files["s.txt"])
    arc2 = tmp_path / "ref-he.7z"
    subprocess.run([REF_7ZZ, "a", str(arc2), str(src), "-ppw1", "-mhe=on"],
                   capture_output=True, check=True, cwd=tmp_path)
    out = SevenZipReader(arc2.read_bytes(), password="pw1").extract_all()
    assert out["s.txt"] == files["s.txt"]
