"""CAB container tests (reference: CPP/7zip/Archive/Cab/)."""

import os
import subprocess

import pytest

from tpu7z.containers import cab
from tpu7z.utils.errors import CorruptError

REF = "/tmp/refsrc/CPP/7zip/Bundles/Alone2/_o/7zz"


@pytest.mark.parametrize("comp", ["mszip", "none"])
def test_roundtrip(corpus, comp):
    files = {"a.txt": corpus["text"], "d/b.bin": corpus["random"][:40000],
             "sparse": corpus["sparse"], "empty": b""}
    blob = cab.write_cab(files, compression=comp)
    back = cab.read_cab(blob)
    for k, v in files.items():
        assert back[k] == v


def test_corrupt_detected(corpus):
    blob = bytearray(cab.write_cab({"f": corpus["text"][:50000]}))
    blob[len(blob) - 40] ^= 0xFF
    with pytest.raises(Exception):
        got = cab.read_cab(bytes(blob))
        assert got["f"] == corpus["text"][:50000]


@pytest.mark.skipif(not os.path.exists(REF), reason="no reference binary")
@pytest.mark.parametrize("comp", ["mszip", "none"])
def test_reference_extracts_ours(tmp_path, corpus, comp):
    files = {"x.txt": corpus["text"][:60000], "sub/y.bin": corpus["struct"]}
    arc = tmp_path / "o.cab"
    arc.write_bytes(cab.write_cab(files, compression=comp))
    out = tmp_path / "out"
    out.mkdir()
    r = subprocess.run([REF, "x", f"-o{out}", str(arc)], capture_output=True)
    assert r.returncode == 0, r.stderr
    assert (out / "x.txt").read_bytes() == files["x.txt"]
    assert (out / "sub" / "y.bin").read_bytes() == files["sub/y.bin"]


def test_cab_lzx_roundtrip(corpus):
    """LZX folders (typeCompress 3, window bits in bits 8-12) — both
    directions through our codec (CabHandler LZX path)."""
    from tpu7z.containers import cab
    files = {"a.txt": corpus["text"][:60000],
             "b.bin": bytes(range(256)) * 300,
             "r.bin": corpus["random"][:40000]}
    arc = cab.write_cab(files, compression="lzx")
    assert cab.read_cab(arc) == files


def test_cab_lzx_reference_interop(tmp_path):
    import subprocess

    from tests.conftest import REF_7ZZ, have_ref
    if not have_ref():
        import pytest
        pytest.skip("reference 7zz binary not built")
    from tpu7z.containers import cab
    files = {"doc.txt": b"reference reads cab lzx " * 4000}
    arc = tmp_path / "t.cab"
    arc.write_bytes(cab.write_cab(files, compression="lzx"))
    r = subprocess.run([REF_7ZZ, "t", str(arc)], capture_output=True,
                       text=True)
    assert "Everything is Ok" in r.stdout, r.stdout
    r = subprocess.run([REF_7ZZ, "e", "-so", str(arc), "doc.txt"],
                       capture_output=True)
    assert r.stdout == files["doc.txt"]
