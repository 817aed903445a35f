"""lzip (.lz) container tests (reference: fork lzip decode patch,
/root/reference/README.md:147)."""

import shutil
import subprocess

import pytest

from tpu7z.containers import lzip
from tpu7z.utils.errors import CorruptError

REF = "/tmp/refsrc/CPP/7zip/Bundles/Alone2/_o/7zz"


def test_roundtrip(corpus):
    data = (corpus["text"] + corpus["struct"])[: 300 << 10]
    c = lzip.compress(data)
    assert lzip.decompress(c) == data


def test_multimember(corpus):
    blob = corpus["text"]
    a, b = blob[:5000], blob[5000:9000]
    c = lzip.compress(a) + lzip.compress(b)
    assert lzip.decompress(c) == a + b


def test_corrupt_detected(corpus):
    c = bytearray(lzip.compress(corpus["text"][:20000]))
    c[len(c) // 2] ^= 0xFF
    with pytest.raises(CorruptError):
        lzip.decompress(bytes(c))


@pytest.mark.skipif(not shutil.which(REF) and not __import__("os").path.exists(REF),
                    reason="reference binary not built")
def test_reference_decodes_ours(tmp_path, corpus):
    data = corpus["text"][: 100 << 10]
    arc = tmp_path / "t.lz"
    arc.write_bytes(lzip.compress(data))
    r = subprocess.run([REF, "e", "-so", str(arc)], capture_output=True)
    assert r.returncode == 0
    assert r.stdout == data
