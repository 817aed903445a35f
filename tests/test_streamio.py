"""Bounded-memory stream extraction (utils/streamio, InBuffer analog)."""

import io
import os
import subprocess
import sys

import pytest

from tpu7z.utils import streamio
from tpu7z.utils.errors import CorruptError


def _data():
    return (b"streaming extraction payload " * 4000
            + os.urandom(65536) + b"tail" * 999)


def test_stream_lz4(tmp_path):
    from tpu7z.models.lz4 import frame
    data = _data()
    p = tmp_path / "f.lz4"
    p.write_bytes(frame.compress_frame(data))
    out = io.BytesIO()
    n = streamio.stream_extract(str(p), "lz4", out)
    assert n == len(data) and out.getvalue() == data


def test_stream_zstd_multiframe(tmp_path):
    from tpu7z.models.zstd import frame
    data = _data()
    half = len(data) // 2
    blob = frame.compress(data[:half], level=3) \
        + frame.compress(data[half:], level=1)
    p = tmp_path / "f.zst"
    p.write_bytes(blob)
    out = io.BytesIO()
    n = streamio.stream_extract(str(p), "zstd", out)
    assert n == len(data) and out.getvalue() == data


@pytest.mark.parametrize("kind", ["gzip", "bzip2", "xz"])
def test_stream_zlib_family(tmp_path, kind):
    import bz2
    import gzip
    import lzma
    data = _data()
    blob = {"gzip": lambda: gzip.compress(data),
            "bzip2": lambda: bz2.compress(data),
            "xz": lambda: lzma.compress(data)}[kind]()
    p = tmp_path / "f.bin"
    p.write_bytes(blob)
    out = io.BytesIO()
    n = streamio.stream_extract(str(p), kind, out)
    assert n == len(data) and out.getvalue() == data


def test_stream_corrupt(tmp_path):
    p = tmp_path / "bad.lz4"
    p.write_bytes(b"\x04\x22\x4d\x18" + b"\xff" * 10)
    with pytest.raises(CorruptError):
        streamio.stream_extract(str(p), "lz4", io.BytesIO())


def test_cli_streaming_extract(tmp_path):
    """`x -mmt1` on a single-stream archive goes through the streaming
    path and produces identical bytes."""
    from tpu7z.models.lz4 import frame
    data = _data()
    arc = tmp_path / "doc.bin.lz4"
    arc.write_bytes(frame.compress_frame(data))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-m", "tpu7z.cli", "x", "-mmt1",
                        "-o" + str(tmp_path / "out"), str(arc)],
                       capture_output=True, env=env, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert (tmp_path / "out" / "doc.bin").read_bytes() == data
