"""CLI device-tier product path: `a -tlz4 -mdev` must go through the
mesh pipeline (parallel/sharded.py shard_compress_lz4_device), produce
bytes invariant in the mesh size, decode with our own extractor, and
decode with the reference binary when present (C/MtCoder.c:445 analog
as a product path, not a bench-only one)."""

import os
import subprocess
import sys
import tempfile

import pytest

from tests.conftest import REF_7ZZ, have_ref

pytestmark = pytest.mark.skipif(
    os.environ.get("TPU7Z_SKIP_SLOW") == "1", reason="slow")


def _cli(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    return subprocess.run([sys.executable, "-m", "tpu7z.cli"] + args,
                          cwd=cwd, env=env, capture_output=True,
                          timeout=1200)


@pytest.fixture(scope="module")
def device_archive():
    """One CLI run through the device path (W=64 pipeline on the
    virtual CPU mesh — small input keeps XLA-CPU time sane)."""
    data = (b"the quick brown fox jumps over the lazy dog " * 1500
            + os.urandom(8192))[: 70000]
    td = tempfile.mkdtemp()
    src = os.path.join(td, "input.bin")
    open(src, "wb").write(data)
    r = _cli(["a", "-tlz4", "-mdev", "out.lz4", "input.bin"], td)
    assert r.returncode == 0, r.stdout + r.stderr
    arc = open(os.path.join(td, "out.lz4"), "rb").read()
    return td, data, arc


def test_cli_device_lz4_roundtrip(device_archive):
    td, data, arc = device_archive
    r = _cli(["t", "out.lz4"], td)
    assert r.returncode == 0, r.stdout + r.stderr
    from tpu7z.models.lz4 import frame
    assert frame.decompress(arc) == data


def test_cli_device_bytes_mesh_invariant(device_archive):
    """The same input on a smaller mesh yields identical bytes (the
    ordered-gather frame layout is mesh-size independent)."""
    td, data, arc = device_archive
    from tpu7z.parallel.mesh import make_mesh
    from tpu7z.parallel.sharded import shard_compress_lz4_device
    small = shard_compress_lz4_device(data, mesh=make_mesh(2))
    assert small == arc


@pytest.mark.skipif(not have_ref(), reason="reference 7zz not built")
def test_cli_device_reference_decodes(device_archive):
    td, data, arc = device_archive
    r = subprocess.run([REF_7ZZ, "e", "-tlz4", "-so",
                        os.path.join(td, "out.lz4")],
                       capture_output=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert r.stdout == data
