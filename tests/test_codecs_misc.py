"""BZip2, Deflate/gzip, and filter tests against trusted implementations."""

import bz2 as bz2lib
import gzip as gziplib
import lzma
import zlib

import numpy as np
import pytest

from tests.conftest import REF_7ZZ, requires_ref
from tpu7z.models import bzip2, deflate
from tpu7z.models.bzip2 import bwt
from tpu7z.models.filters import bcj, delta


def small(corpus, cap=60000):
    return {k: v[:cap] for k, v in corpus.items()}


# --- BWT kernels -----------------------------------------------------------

def test_bwt_roundtrip(corpus):
    for name, data in small(corpus, 30000).items():
        last, ptr = bwt.bwt_forward(data)
        assert bwt.bwt_inverse(last, ptr) == data, name


def test_bwt_known_vector():
    assert bwt.bwt_forward(b"banana") == (b"nnbaaa", 3)


# --- BZip2 -----------------------------------------------------------------

def test_bzip2_decode_reference_streams(corpus):
    for name, data in small(corpus).items():
        for lvl in (1, 9):
            c = bz2lib.compress(data, lvl)
            assert bzip2.decompress(c) == data, f"{name} lvl{lvl}"


def test_bzip2_encode_externally_decodable(corpus):
    for name, data in small(corpus).items():
        ours = bzip2.compress(data)
        assert bz2lib.decompress(ours) == data, name


def test_bzip2_multiblock():
    data = (b"block boundary test " * 20000)  # > 100k after rle
    ours = bzip2.compress(data, level=1)
    assert bz2lib.decompress(ours) == data
    assert bzip2.decompress(ours) == data


# --- Deflate / gzip --------------------------------------------------------

def test_deflate_decode_reference_streams(corpus):
    for name, data in small(corpus).items():
        for lvl in (1, 6, 9):
            c = zlib.compress(data, lvl)[2:-4]
            assert deflate.decompress(c) == data, f"{name} lvl{lvl}"


def test_deflate_encode_externally_decodable(corpus):
    for name, data in small(corpus).items():
        ours = deflate.compress(data)
        assert zlib.decompress(ours, wbits=-15) == data, name


def test_gzip_both_directions(corpus):
    data = corpus["text"]
    assert gziplib.decompress(deflate.gzip_compress(data)) == data
    assert deflate.gzip_decompress(gziplib.compress(data, 6)) == data


# --- Filters ---------------------------------------------------------------

def test_delta_matches_liblzma(corpus):
    data = corpus["struct"][:50000]
    for dist in (1, 2, 4, 8, 16):
        enc = delta.delta_encode(data, dist)
        assert delta.delta_decode(enc, dist) == data
        c = lzma.compress(data, format=lzma.FORMAT_RAW, filters=[
            {"id": lzma.FILTER_DELTA, "dist": dist},
            {"id": lzma.FILTER_LZMA2, "preset": 0}])
        mid = lzma.decompress(c, format=lzma.FORMAT_RAW, filters=[
            {"id": lzma.FILTER_LZMA2, "preset": 0}])
        assert enc == mid, f"dist {dist}"


@pytest.mark.parametrize("fid,name", [
    (lzma.FILTER_X86, "x86"),
    (lzma.FILTER_ARM, "arm"),
    (lzma.FILTER_SPARC, "sparc"),
    (lzma.FILTER_POWERPC, "ppc"),
])
def test_bcj_matches_liblzma(fid, name):
    rng = np.random.default_rng(11)
    buf = bytearray(rng.integers(0, 256, 30000, dtype=np.uint8).tobytes())
    if name == "x86":
        for i in range(0, len(buf) - 10, 37):
            buf[i] = 0xE8
            buf[i + 4] = 0x00
    buf = bytes(buf)
    c = lzma.compress(buf, format=lzma.FORMAT_RAW, filters=[
        {"id": fid}, {"id": lzma.FILTER_LZMA2, "preset": 0}])
    mid = lzma.decompress(c, format=lzma.FORMAT_RAW, filters=[
        {"id": lzma.FILTER_LZMA2, "preset": 0}])
    enc, dec = bcj.FILTERS[name]
    assert enc(buf) == mid
    assert dec(enc(buf)) == buf


def test_bcj_arm64_roundtrip():
    rng = np.random.default_rng(12)
    w = rng.integers(0, 2 ** 32, 4096, dtype=np.uint64).astype(np.uint32)
    w[::5] = (0x94000000 | (w[::5] & 0x03FFFFFF)).astype(np.uint32)
    buf = w.astype("<u4").tobytes()
    assert bcj.bcj_arm64_decode(bcj.bcj_arm64_encode(buf)) == buf


def test_bcj_armt_matches_liblzma():
    rng = np.random.default_rng(21)
    buf = bytearray(rng.integers(0, 256, 30000, dtype=np.uint8).tobytes())
    for i in range(0, len(buf) - 4, 24):
        buf[i + 1] = 0xF0 | (buf[i + 1] & 7)
        buf[i + 3] = 0xF8 | (buf[i + 3] & 7)
    buf = bytes(buf)
    c = lzma.compress(buf, format=lzma.FORMAT_RAW, filters=[
        {"id": lzma.FILTER_ARMTHUMB}, {"id": lzma.FILTER_LZMA2, "preset": 0}])
    mid = lzma.decompress(c, format=lzma.FORMAT_RAW, filters=[
        {"id": lzma.FILTER_LZMA2, "preset": 0}])
    assert bcj.bcj_armt_encode(buf) == mid
    assert bcj.bcj_armt_decode(mid) == buf


def test_bcj_ia64_matches_liblzma():
    rng = np.random.default_rng(22)
    buf = bytearray(rng.integers(0, 256, 32000, dtype=np.uint8).tobytes())
    for i in range(0, len(buf), 16):
        buf[i] = (buf[i] & ~0x1F) | int(rng.integers(16, 32))
    buf = bytes(buf)
    c = lzma.compress(buf, format=lzma.FORMAT_RAW, filters=[
        {"id": lzma.FILTER_IA64}, {"id": lzma.FILTER_LZMA2, "preset": 0}])
    mid = lzma.decompress(c, format=lzma.FORMAT_RAW, filters=[
        {"id": lzma.FILTER_LZMA2, "preset": 0}])
    assert bcj.bcj_ia64_encode(buf) == mid
    assert bcj.bcj_ia64_decode(mid) == buf


@requires_ref
def test_bcj_riscv_matches_reference(tmp_path):
    """RISC-V filter vs reference (C/Bra.c RISCV): bit-exact encode
    (via a RISCV+Copy 7z folder whose pack stream IS the filtered
    bytes) and decode of a reference RISCV+LZMA2 archive."""
    import random
    import subprocess
    from tpu7z.containers.sevenzip.reader import SevenZipReader
    rng = random.Random(31)
    buf = bytearray(rng.randbytes(150000))
    for i in range(0, len(buf) - 8, 12):
        buf[i] = rng.choice([0x6F, 0xEF, 0x17, 0x97, 0x13, 0x33, 0x67])
    buf = bytes(buf)
    src = tmp_path / "rv.bin"
    src.write_bytes(buf)
    arc = tmp_path / "rv.7z"
    subprocess.run([REF_7ZZ, "a", "-m0=RISCV", "-m1=Copy", str(arc),
                    "rv.bin"], capture_output=True, check=True,
                   cwd=tmp_path)
    packed = arc.read_bytes()[32:32 + len(buf)]
    assert bcj.bcj_riscv_encode(buf) == packed
    assert bcj.bcj_riscv_decode(packed) == buf
    arc2 = tmp_path / "rv2.7z"
    subprocess.run([REF_7ZZ, "a", "-m0=RISCV", "-m1=LZMA2:d=1m",
                    str(arc2), "rv.bin"], capture_output=True, check=True,
                   cwd=tmp_path)
    out = SevenZipReader(arc2.read_bytes()).extract_all()
    assert out["rv.bin"] == buf


def test_swap_filters():
    rng = np.random.default_rng(23)
    d = rng.integers(0, 256, 1001, dtype=np.uint8).tobytes()
    assert bcj.swap2(bcj.swap2(d)) == d
    assert bcj.swap4(bcj.swap4(d)) == d
    assert bcj.swap2(b"abcd") == b"badc"
    assert bcj.swap4(b"abcd") == b"dcba"


@requires_ref
def test_deflate64_zip_decode(tmp_path):
    """Deflate64 (PKWARE enhanced deflate): decode the reference's
    -mm=Deflate64 zip output, incl. >32K distances / 64K window."""
    import random
    import subprocess
    from tpu7z.containers import zip as zc
    rng = random.Random(7)
    words = ["".join(rng.choice("abcdefgh") for _ in range(9))
             for _ in range(300)]
    data = (" ".join(rng.choice(words) for _ in range(60000))).encode()
    data = data[:200000] + data[:60000] + data[140000:200000]
    src = tmp_path / "d.txt"
    src.write_bytes(data)
    arc = tmp_path / "d.zip"
    subprocess.run([REF_7ZZ, "a", "-tzip", str(arc), str(src),
                    "-mm=Deflate64", "-mx=9"], capture_output=True,
                   check=True, cwd=tmp_path)
    out = zc.read_zip(arc.read_bytes())
    assert out[list(out)[0]] == data


class TestLhaHuffman:
    """lh4-lh7 LZSS + dynamic-Huffman codec (LzhHandler.cpp methods);
    bitstream validity is cross-checked against the reference CLI in
    the verify flow, these cover the codec + container in-tree."""

    def _cases(self):
        import numpy as np
        rng = np.random.default_rng(0)
        words = [b"alpha ", b"beta ", b"gamma ", b"delta "]
        return [
            b"", b"a", b"aa", b"abc" * 400,
            b"".join(words[i] for i in rng.integers(0, 4, 5000)),
            rng.integers(0, 256, 5000, np.uint8).tobytes(),
            b"\x00" * 70000,
        ]

    def test_roundtrip_all_methods(self):
        from tpu7z.models import lha_huffman as lh
        for m in ("lh4", "lh5", "lh6", "lh7"):
            for k, d in enumerate(self._cases()):
                e = lh.encode(d, m)
                assert lh.decode(e, len(d), m) == d, (m, k)

    def test_container_lh5(self):
        import numpy as np
        from tpu7z.containers import lzh
        rng = np.random.default_rng(5)
        files = {
            "doc.txt": bytes(rng.integers(97, 105, 20000, np.uint8)) * 2,
            "rand.bin": rng.integers(0, 256, 5000, np.uint8).tobytes(),
            "zeros.dat": b"\x00" * 30000,
        }
        arc = lzh.write_lzh(files, method="lh5")
        assert lzh.read_lzh(arc) == files
        # compressed members actually smaller than store
        assert len(arc) < sum(len(v) for v in files.values())

    def test_corrupt_member_raises(self):
        from tpu7z.containers import lzh
        from tpu7z.utils.errors import CorruptError
        import pytest
        arc = bytearray(lzh.write_lzh({"x.txt": b"hello world " * 400},
                                      method="lh5"))
        arc[len(arc) // 2] ^= 0xFF
        with pytest.raises(Exception):
            lzh.read_lzh(bytes(arc))
