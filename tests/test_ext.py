"""ext2/ext4 image reader tests (reference: CPP/7zip/Archive/ExtHandler.cpp;
images created by mke2fs -d, content cross-checked against 7zz)."""

import os
import shutil
import subprocess

import pytest

from tpu7z.containers import ext

MKE2FS = shutil.which("mke2fs") or "/usr/sbin/mke2fs"
REF = "/tmp/refsrc/CPP/7zip/Bundles/Alone2/_o/7zz"


def _make_image(tmp_path, fstype, bs, size_blocks, corpus):
    tree = tmp_path / "tree"
    tree.mkdir()
    (tree / "a.txt").write_bytes(corpus["text"][:10000])
    sub = tree / "d1" / "d2"
    sub.mkdir(parents=True)
    (sub / "deep.bin").write_bytes(corpus["random"][:50000])
    (tree / "sparse").write_bytes(corpus["sparse"])
    img = tmp_path / f"img.{fstype}"
    r = subprocess.run([MKE2FS, "-q", "-t", fstype, "-b", str(bs), "-d",
                        str(tree), "-N", "64", str(img),
                        str(size_blocks)], capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"mke2fs failed: {r.stderr.decode()[:100]}")
    return img, tree


@pytest.mark.skipif(not os.path.exists(MKE2FS), reason="no mke2fs")
@pytest.mark.parametrize("fstype,bs,nblocks", [("ext2", 1024, 2048),
                                               ("ext4", 4096, 4096)])
def test_read_matches_source(tmp_path, corpus, fstype, bs, nblocks):
    img, tree = _make_image(tmp_path, fstype, bs, nblocks, corpus)
    files = ext.read_ext(img.read_bytes())
    assert files["a.txt"] == corpus["text"][:10000]
    assert files["d1/d2/deep.bin"] == corpus["random"][:50000]
    assert files["sparse"] == corpus["sparse"]


@pytest.mark.skipif(not (os.path.exists(MKE2FS) and os.path.exists(REF)),
                    reason="missing tools")
def test_matches_reference_extraction(tmp_path, corpus):
    img, _ = _make_image(tmp_path, "ext4", 1024, 20480, corpus)
    out = tmp_path / "refout"
    out.mkdir()
    r = subprocess.run([REF, "x", f"-o{out}", str(img)],
                       capture_output=True)
    assert r.returncode == 0
    files = ext.read_ext(img.read_bytes())
    for name, content in files.items():
        if name.endswith("/"):
            continue
        assert (out / name).read_bytes() == content
