"""WIM container tests (reference: CPP/7zip/Archive/Wim/WimIn.cpp;
fixtures created by the reference binary itself)."""

import os
import subprocess

import pytest

from tpu7z.containers import wim

REF = "/tmp/refsrc/CPP/7zip/Bundles/Alone2/_o/7zz"
HAVE_REF = os.path.exists(REF)


def test_self_roundtrip(corpus):
    files = {"a.txt": corpus["text"][:5000], "sub/b.bin": corpus["struct"][:3000],
             "sub/deep/c": b"x", "empty/": b""}
    blob = wim.write_wim(files)
    back = wim.read_wim(blob)
    for k, v in files.items():
        assert back[k] == v


@pytest.mark.skipif(not HAVE_REF, reason="no reference binary")
def test_read_reference_created(tmp_path, corpus):
    src = tmp_path / "in"
    src.mkdir()
    (src / "f1.txt").write_bytes(corpus["text"][:2000])
    sub = src / "d"
    sub.mkdir()
    (sub / "f2.bin").write_bytes(corpus["random"][:1000])
    arc = tmp_path / "t.wim"
    r = subprocess.run([REF, "a", "-twim", str(arc), "f1.txt", "d"],
                       cwd=src, capture_output=True)
    assert r.returncode == 0, r.stderr
    files = wim.read_wim(arc.read_bytes())
    assert files["f1.txt"] == corpus["text"][:2000]
    assert files["d/f2.bin"] == corpus["random"][:1000]


@pytest.mark.skipif(not HAVE_REF, reason="no reference binary")
def test_reference_extracts_ours(tmp_path, corpus):
    files = {"x.txt": corpus["text"][:4000], "dir/y.bin": corpus["sparse"][:2000]}
    arc = tmp_path / "o.wim"
    arc.write_bytes(wim.write_wim(files))
    out = tmp_path / "out"
    out.mkdir()
    r = subprocess.run([REF, "x", f"-o{out}", str(arc)], capture_output=True)
    assert r.returncode == 0, r.stderr
    assert (out / "x.txt").read_bytes() == files["x.txt"]
    assert (out / "dir" / "y.bin").read_bytes() == files["dir/y.bin"]
