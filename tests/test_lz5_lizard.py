"""LZ5 and Lizard codec tests vs the reference binary."""

import subprocess

import numpy as np
import pytest

from tpu7z.models import lizard, lz5
from tests.conftest import REF_7ZZ, requires_ref


@pytest.fixture(scope="module")
def samples():
    rng = np.random.default_rng(9)
    return {
        "text": b"the lazy brown fox and the quick dog trade places " * 800,
        "rand": rng.integers(0, 256, 30000, dtype=np.uint8).tobytes(),
        "runs": b"abcabcabc" * 5000 + b"ta!il",
        "empty": b"",
        "short": b"hello world",
        "zeros": b"\x00" * 100000,
    }


def test_lz5_self_roundtrip(samples):
    for name, d in samples.items():
        fr = lz5.compress_frame(d)
        got, _ = lz5.decompress_frame(fr)
        assert got == d, name


def test_lizard_self_roundtrip(samples):
    for name, d in samples.items():
        fr = lizard.compress_frame(d)
        assert lizard.decompress(fr) == d, name


@requires_ref
def test_lz5_reference_decodes_ours(tmp_path, samples):
    for name in ("text", "rand", "runs", "zeros"):
        p = tmp_path / f"{name}.lz5"
        p.write_bytes(lz5.compress_frame(samples[name]))
        r = subprocess.run([REF_7ZZ, "e", "-tlz5", "-so", str(p)],
                           capture_output=True, check=True)
        assert r.stdout == samples[name], name


@requires_ref
def test_lz5_we_decode_reference(tmp_path, samples):
    for name in ("text", "rand", "runs"):
        src = tmp_path / name
        src.write_bytes(samples[name])
        arc = tmp_path / f"{name}.o.lz5"
        subprocess.run([REF_7ZZ, "a", "-tlz5", str(arc), str(src)],
                       capture_output=True, check=True)
        assert lz5.decompress(arc.read_bytes()) == samples[name], name


@requires_ref
def test_lizard_reference_decodes_ours(tmp_path, samples):
    for name in ("text", "rand", "runs", "zeros"):
        p = tmp_path / f"{name}.liz"
        p.write_bytes(lizard.compress_frame(samples[name]))
        r = subprocess.run([REF_7ZZ, "e", "-tlizard", "-so", str(p)],
                           capture_output=True, check=True)
        assert r.stdout == samples[name], name


@requires_ref
@pytest.mark.parametrize("level", [10, 14, 17, 19, 20, 25, 30, 35, 41, 49])
def test_lizard_we_decode_reference_all_families(tmp_path, samples, level):
    """All 4 lizard level families: fastLZ4, LIZv1, +Huffman variants."""
    src = tmp_path / "text"
    src.write_bytes(samples["text"])
    arc = tmp_path / f"l{level}.liz"
    r = subprocess.run([REF_7ZZ, "a", "-tlizard", f"-mx{level}",
                        str(arc), str(src)], capture_output=True)
    assert r.returncode == 0
    assert lizard.decompress(arc.read_bytes()) == samples["text"]


def test_lizard_liz_self_roundtrip(samples):
    for name, d in samples.items():
        for level in (21, 25, 29, 20):
            fr = lizard.compress_frame(d, level=level)
            assert lizard.decompress(fr) == d, (name, level)


@requires_ref
def test_lizard_liz_reference_decodes_ours(tmp_path, samples):
    for name in ("text", "rand", "runs", "zeros"):
        p = tmp_path / f"{name}.liz"
        p.write_bytes(lizard.compress_frame(samples[name], level=21))
        r = subprocess.run([REF_7ZZ, "e", "-tlizard", "-so", str(p)],
                           capture_output=True, check=True)
        assert r.stdout == samples[name], name


def test_lizard_huffman_levels_roundtrip(corpus):
    from tpu7z.models import lizard
    data = corpus["text"] + corpus["struct"][:30000]
    for lvl in (31, 35, 41, 45, 49):
        c = lizard.compress_frame(data, level=lvl)
        assert lizard.decompress(c) == data
    # entropy coding must help on text
    raw = lizard.compress_frame(data, level=25)
    huf = lizard.compress_frame(data, level=45)
    assert len(huf) < len(raw)


def test_lizard_huffman_reference_decodes(tmp_path, corpus):
    import os
    import subprocess
    ref = "/tmp/refsrc/CPP/7zip/Bundles/Alone2/_o/7zz"
    if not os.path.exists(ref):
        import pytest
        pytest.skip("no reference binary")
    from tpu7z.models import lizard
    data = corpus["text"] + corpus["random"][:20000]
    arc = tmp_path / "t.liz"
    arc.write_bytes(lizard.compress_frame(data, level=45))
    r = subprocess.run([ref, "e", "-tlizard", "-so", str(arc)],
                       capture_output=True)
    assert r.returncode == 0 and r.stdout == data
