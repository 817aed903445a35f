"""ZIP and TAR container tests vs stdlib + reference binary."""

import io
import subprocess
import tarfile
import zipfile

import numpy as np
import pytest

from tpu7z.containers import tar as tarc
from tpu7z.containers import zip as zipc
from tests.conftest import REF_7ZZ, requires_ref


@pytest.fixture(scope="module")
def files():
    rng = np.random.default_rng(1)
    return {
        "one.txt": b"zip file one " * 400,
        "dir/two.bin": rng.integers(0, 256, 20000,
                                    dtype=np.uint8).tobytes(),
        "empty.txt": b"",
    }


@pytest.mark.parametrize("method", [zipc.M_STORE, zipc.M_DEFLATE,
                                    zipc.M_ZSTD, zipc.M_BZIP2,
                                    zipc.M_LZMA, zipc.M_XZ])
def test_zip_roundtrip(files, method):
    z = zipc.write_zip(files, method=method)
    assert zipc.read_zip(z) == files


@pytest.mark.parametrize("method", [zipc.M_STORE, zipc.M_DEFLATE,
                                    zipc.M_BZIP2, zipc.M_LZMA])
def test_zip_stdlib_reads_ours(files, method):
    z = zipc.write_zip(files, method=method)
    zf = zipfile.ZipFile(io.BytesIO(z))
    for n, d in files.items():
        assert zf.read(n) == d


def test_zip_read_stdlib(files):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for n, d in files.items():
            zf.writestr(n, d)
    assert zipc.read_zip(buf.getvalue()) == files


@requires_ref
@pytest.mark.parametrize("method", ["deflate", "zstd", "xz"])
def test_zip_reference_accepts_ours(tmp_path, files, method):
    mid = {"deflate": zipc.M_DEFLATE, "zstd": zipc.M_ZSTD,
           "xz": zipc.M_XZ}[method]
    p = tmp_path / "t.zip"
    p.write_bytes(zipc.write_zip(files, method=mid))
    r = subprocess.run([REF_7ZZ, "t", str(p)], capture_output=True)
    assert b"Everything is Ok" in r.stdout


@requires_ref
def test_zip_read_reference_zstd(tmp_path, files):
    for n, d in files.items():
        fp = tmp_path / n.replace("/", "_")
        fp.write_bytes(d)
    arc = tmp_path / "r.zip"
    subprocess.run([REF_7ZZ, "a", str(arc), "-mm=zstd",
                    *(str(tmp_path / n.replace("/", "_"))
                      for n in files)], capture_output=True, check=True)
    out = zipc.read_zip(arc.read_bytes())
    for n, d in files.items():
        assert out[n.replace("/", "_")] == d


def test_tar_both_directions(files):
    t = tarc.write_tar(files)
    tf = tarfile.open(fileobj=io.BytesIO(t))
    for n, d in files.items():
        assert tf.extractfile(n).read() == d
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for n, d in files.items():
            ti = tarfile.TarInfo(n)
            ti.size = len(d)
            tf.addfile(ti, io.BytesIO(d))
    assert tarc.read_tar(buf.getvalue()) == files


def test_tar_zst_stack(files):
    """.tar.zst: the standard stacked-container flow."""
    from tpu7z.models.zstd import compressor, frame
    t = tarc.write_tar(files)
    tz = compressor.compress(t, level=3)
    assert tarc.read_tar(frame.decompress(tz)) == files


def test_zip64_roundtrip_and_interop():
    """ZIP64 structures (APPNOTE 4.5; ZipOut.cpp zip64 path) — forced
    small-file zip64 must round-trip and be stdlib-readable."""
    import io
    import zipfile

    from tpu7z.containers import zip as zc
    files = {"a.txt": b"hello zip64 " * 500,
             "b.bin": bytes(range(256)) * 100}
    arc = zc.write_zip(files, zip64=True)
    assert zc.read_zip(arc) == files
    z = zipfile.ZipFile(io.BytesIO(arc))
    assert z.read("a.txt") == files["a.txt"]
    # and stdlib-produced archives still read fine
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("x.txt", b"stdlib content" * 200)
    assert zc.read_zip(buf.getvalue())["x.txt"] == b"stdlib content" * 200
