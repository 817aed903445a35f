"""PPMd7 (PPMdH) tests: bit-compat with the reference C implementation
via .7z archives in both directions."""

import subprocess

import numpy as np
import pytest

from tpu7z.models import ppmd
from tpu7z.containers.sevenzip import SevenZipReader, write_archive
from tests.conftest import REF_7ZZ, requires_ref


def test_self_roundtrip_small():
    data = b"abracadabra, the quick brown fox! " * 50
    stream, props = ppmd.compress(data, order=6, mem=1 << 20)
    assert ppmd.decompress(stream, props, len(data)) == data


def test_self_roundtrip_orders(corpus):
    data = corpus["text"][:20000]
    for order in (2, 4, 8, 16):
        stream, props = ppmd.compress(data, order=order, mem=1 << 22)
        assert ppmd.decompress(stream, props, len(data)) == data, order


def test_self_roundtrip_binary(corpus):
    for name in ("random", "sparse", "struct"):
        data = corpus[name][:20000]
        stream, props = ppmd.compress(data)
        assert ppmd.decompress(stream, props, len(data)) == data, name


def test_ratio_beats_deflate(corpus):
    data = corpus["text"][:30000]
    import zlib
    stream, _ = ppmd.compress(data)
    assert len(stream) < len(zlib.compress(data, 9))


@requires_ref
def test_decode_reference_ppmd_archive(tmp_path, corpus):
    f = tmp_path / "t.txt"
    f.write_bytes(corpus["text"][:30000])
    arc = tmp_path / "p.7z"
    subprocess.run([REF_7ZZ, "a", str(arc), "-m0=ppmd", str(f)],
                   capture_output=True, check=True)
    out = SevenZipReader(arc.read_bytes()).extract_all()
    assert out["t.txt"] == corpus["text"][:30000]


@requires_ref
def test_reference_decodes_our_ppmd(tmp_path, corpus):
    files = {"t.txt": corpus["text"][:30000],
             "b.bin": corpus["struct"][:10000]}
    arc = tmp_path / "ours.7z"
    arc.write_bytes(write_archive(files, method="ppmd"))
    r = subprocess.run([REF_7ZZ, "t", str(arc)], capture_output=True)
    assert b"Everything is Ok" in r.stdout
    outdir = tmp_path / "x"
    subprocess.run([REF_7ZZ, "x", "-y", f"-o{outdir}", str(arc)],
                   capture_output=True, check=True)
    for n, d in files.items():
        assert (outdir / n).read_bytes() == d
