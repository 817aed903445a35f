"""Brotli codec tests vs the reference binary (all quality families)."""

import subprocess

import numpy as np
import pytest

from tpu7z.models import brotli
from tests.conftest import REF_7ZZ, requires_ref


def test_store_roundtrip(corpus):
    for name, data in corpus.items():
        c = brotli.compress(data)
        assert brotli.decompress(c) == data, name


def test_mt_container_roundtrip(corpus):
    data = corpus["text"]
    c = brotli.compress_mt_container(data)
    assert brotli.decompress_mt_container(c) == data


@requires_ref
@pytest.mark.parametrize("quality", [1, 5, 9, 11])
def test_decode_reference_streams(tmp_path, corpus, quality):
    src = tmp_path / "in"
    src.write_bytes(corpus["text"])
    arc = tmp_path / "t.br"
    subprocess.run([REF_7ZZ, "a", "-tbrotli", f"-mx{quality}", str(arc),
                    str(src)], capture_output=True, check=True)
    assert brotli.decompress_mt_container(arc.read_bytes()) == corpus["text"]


@requires_ref
def test_decode_reference_mt_container(tmp_path, corpus):
    data = corpus["text"] * 3
    src = tmp_path / "in"
    src.write_bytes(data)
    arc = tmp_path / "t.br"
    subprocess.run([REF_7ZZ, "a", "-tbrotli", "-mmt2", "-mx1", str(arc),
                    str(src)], capture_output=True, check=True)
    assert brotli.decompress_mt_container(arc.read_bytes()) == data


@requires_ref
def test_reference_decodes_our_streams(tmp_path, corpus):
    data = corpus["text"]
    bare = tmp_path / "bare.br"
    bare.write_bytes(brotli.compress(data))
    r = subprocess.run([REF_7ZZ, "e", "-tbrotli", "-so", str(bare)],
                       capture_output=True, check=True)
    assert r.stdout == data
    # MT container decodes with the MT path (-mmt2; the reference's
    # single-threaded path rejects even its own mt-frames)
    mt = tmp_path / "mt.br"
    mt.write_bytes(brotli.compress_mt_container(data))
    r = subprocess.run([REF_7ZZ, "e", "-tbrotli", "-mmt2", "-so", str(mt)],
                       capture_output=True, check=True)
    assert r.stdout == data


@requires_ref
def test_binary_data_all_qualities(tmp_path, corpus):
    data = corpus["struct"]
    src = tmp_path / "b"
    src.write_bytes(data)
    for q in (1, 9):
        arc = tmp_path / f"b{q}.br"
        subprocess.run([REF_7ZZ, "a", "-tbrotli", f"-mx{q}", str(arc),
                        str(src)], capture_output=True, check=True)
        assert brotli.decompress_mt_container(arc.read_bytes()) == data, q


def test_dictionary_references(tmp_path, corpus):
    """q11 on English text exercises static-dictionary word transforms."""
    if not __import__("os").path.exists(REF_7ZZ):
        pytest.skip("no reference")
    data = (b"the particular information about development should only "
            b"download different government websites because performance "
            b"children population nothing Internet ") * 50
    src = tmp_path / "d"
    src.write_bytes(data)
    arc = tmp_path / "d.br"
    subprocess.run([REF_7ZZ, "a", "-tbrotli", "-mx11", str(arc), str(src)],
                   capture_output=True, check=True)
    assert brotli.decompress_mt_container(arc.read_bytes()) == data
